"""CLI tools mirroring the reference's `tools/core` harness:

  python -m zvec_tpu.tools.bench   — QPS + latency percentiles
  python -m zvec_tpu.tools.recall  — recall@{1,10,50,100} vs ground truth
  python -m zvec_tpu.tools.build   — offline collection build from .npy/.vecs
"""
