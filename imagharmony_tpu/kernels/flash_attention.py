"""Pallas flash attention (filled in at the kernels milestone).

flash_attention() returning None signals the caller to fall back to XLA.
"""


def flash_attention(q, k, v, *, scale):
    return None
