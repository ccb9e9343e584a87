"""Host-side data plane: nuScenes datasets, image transforms, LiDAR depth GT,
threaded loader, info generation, and the native C++ fast path.

TPU-first counterpart of the reference's mmcv dataset/pipeline registries
(`mmdet3d/datasets/` + `datasets/pipelines/loading.py`): plain python classes
producing channel-last numpy batches that feed straight into jit-compiled
steps — no registry, no per-transform dict plumbing.
"""
