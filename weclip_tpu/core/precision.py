"""Mixed-precision policy helpers.

The reference keeps the frozen CLIP in CUDA fp16 with fp32 islands: QKV math
in fp32 (clip/myAtt.py:199), fp32 LayerNorm (clip/model.py:177-183), fp16
out-projection (myAtt.py:321).  On TPU the idiomatic equivalent is fp32
parameters with bfloat16 matmul inputs and fp32 accumulation (the MXU
accumulates in fp32 natively), and fp32 softmax / LayerNorm.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class Policy:
    compute_dtype: jnp.dtype
    param_dtype: jnp.dtype
    softmax_dtype: jnp.dtype

    def cast_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_softmax(self, x):
        return jnp.asarray(x, self.softmax_dtype)


_DTYPES = {
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "float16": jnp.float16,
}


def make_policy(compute_dtype: str = "bfloat16",
                param_dtype: str = "float32",
                softmax_dtype: str = "float32") -> Policy:
    return Policy(_DTYPES[compute_dtype], _DTYPES[param_dtype], _DTYPES[softmax_dtype])


DEFAULT = make_policy()
FP32 = make_policy("float32", "float32", "float32")
