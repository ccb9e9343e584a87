"""Weights-day activation-parity harness.

Two halves:
- `dump_reference.py` — STANDALONE torch script, run inside the reference
  environment (mmcv/mmdet3d + released checkpoints). Hooks the reference
  model at its module boundaries and writes npz dumps.
- `compare.py` — JAX-side comparator (this repo): replays the dumped
  inputs through the converted-weight veon_tpu model and checks every
  boundary within per-boundary tolerances. Exposed as
  `python -m veon_tpu.cli.main parity --dumps <dir>`.

The comparator half is fully tested here against synthetic dumps
(tests/test_parity_harness.py); the dump half can only execute where torch
+ mmcv + the checkpoints exist — it is kept import-free of this package so
it can be copied into that environment alone.
"""

from .compare import BOUNDARIES, compare_dumps  # noqa: F401
