"""Rematerialization wrapper with selectable checkpoint policy.

The reference checkpoints whole trunk blocks (torch.utils.checkpoint in
`clip_utils/visual.py` / `align_net_occ3d.py`), recomputing EVERYTHING in
the block on backward. XLA can do better: `jax.checkpoint` policies keep
chosen intermediates (e.g. matmul outputs, which are the expensive ops to
recompute but cheap to store relative to attention softmax buffers) and
recompute only the rest — trading less recompute FLOP for slightly more
HBM than full remat, while still fitting the B=1 stage-2 backward.

`remat` accepted by every scan-stacked module:
  False       -> no rematerialization (needs ~21.3 GB at B=1 — OOM on 16 GB)
  True        -> full remat (the torch.utils.checkpoint equivalent)
  "<policy>"  -> selective: a `jax.checkpoint_policies` attribute name,
                 e.g. "dots_saveable" (save every matmul/einsum output) or
                 "dots_with_no_batch_dims_saveable" (save contraction-only
                 dots — XLA's recommended transformer default).
"""

from __future__ import annotations

from typing import Union

import flax.linen as nn
import jax

RematSpec = Union[bool, str]


def remat_wrap(cls, remat: RematSpec):
    """Wrap a scan-body module class per the remat spec (no-op if falsy)."""
    if not remat:
        return cls
    policy = None
    if isinstance(remat, str):
        policy = getattr(jax.checkpoint_policies, remat, None)
        if policy is None:
            raise ValueError(
                f"unknown checkpoint policy {remat!r} — use an attribute of "
                "jax.checkpoint_policies (e.g. 'dots_saveable')")
    return nn.remat(cls, prevent_cse=False, policy=policy)
