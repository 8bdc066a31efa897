"""Mixed-precision policy.

The reference runs fp16 with fp32 VAE upcasts (custom_pipelines.py:365-377,
train.py:594,628). On TPU the native fast dtype is bfloat16, whose fp32-range
exponent removes the overflow that forced the reference's VAE upcast, so the
default policy is bf16 compute / fp32 params with no special-casing.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Dtype policy applied at module boundaries.

    param_dtype:   storage dtype of weights.
    compute_dtype: dtype activations/weights are cast to for compute.
    norm_dtype:    dtype used inside normalization statistics (kept fp32 for
                   stability; cheap on the VPU).
    """

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype = jnp.float32

    def cast(self, x):
        return x.astype(self.compute_dtype) if x.dtype != self.compute_dtype else x


DEFAULT = Policy()
FP32 = Policy(compute_dtype=jnp.float32)
BF16_FULL = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)


def resolve(policy: Policy | str | None) -> Policy:
    if policy is None:
        return DEFAULT
    if isinstance(policy, Policy):
        return policy
    table = {"default": DEFAULT, "fp32": FP32, "bf16": BF16_FULL}
    return table[policy]
