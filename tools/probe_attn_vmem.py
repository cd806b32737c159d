"""Compile-probe `attention_core_pallas` at the eval and GradCAM-pullback
shapes that stress scoped VMEM (fp32/bf16 inputs, L=1025->1040, H=12).
Executes on the real TPU and prints per-call timing; iterate here instead
of the 10-minute full-bench compile.  (Used to calibrate the head-folded
kernel experiment — negative result, see PARITY.md "Attention head-fold";
kept because any future kernel-grid change needs the same probe.)"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from weclip_tpu.ops.pallas_attention import attention_core_pallas

    rng = np.random.default_rng(0)
    b, h, l, dh = 8, 12, 1025, 64
    for dtype, export in ((jnp.float32, True), (jnp.bfloat16, True),
                          (jnp.bfloat16, False)):
        q = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype)
        k = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype)
        v = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype)
        kmask = jnp.ones((b, l), jnp.float32)
        try:
            out, attn = attention_core_pallas(
                q, k, v, kmask, h, score_dtype=jnp.bfloat16,
                export_weights=export)
            np.asarray(out[0, 0, 0, :2])
            t0 = time.perf_counter()
            for _ in range(10):
                out, attn = attention_core_pallas(
                    q, k, v, kmask, h, score_dtype=jnp.bfloat16,
                    export_weights=export)
            np.asarray(out[0, 0, 0, :2])
            ms = (time.perf_counter() - t0) / 10 * 1e3
            print(f"{dtype.__name__} export={export}: ok {ms:6.2f} ms/call")
        except Exception as e:
            msg = str(e)
            i = msg.find("Scoped allocation")
            print(f"{dtype.__name__} export={export}: FAIL "
                  f"{msg[i:i+80] if i >= 0 else msg[:200]}")


if __name__ == "__main__":
    main()
