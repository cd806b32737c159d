"""Profile the host-side image staging in Evaluator.build_batch.

Compares the current CHW staging (zero whole canvas + strided HWC->CHW
scatter) against an HWC staging (pad-region-only zero + contiguous row
copy).  Pure numpy — no jax — so it isolates the host cost that bounds
the end-to-end img/s on this 1-core host.

Run AFTER any background pytest finishes (single core: contention skews).
"""
import time

import numpy as np

CANVAS = 512
B = 8
ROUNDS = 50


def make_examples(rng):
    exs = []
    for _ in range(B):
        oh = int(rng.integers(280, CANVAS + 1))
        ow = int(rng.integers(280, CANVAS + 1))
        exs.append(rng.integers(0, 256, (oh, ow, 3), np.uint8))
    return exs


def stage_chw(buf, exs):
    for j, raw in enumerate(exs):
        oh, ow = raw.shape[:2]
        buf[j] = 0
        buf[j, :, :oh, :ow] = raw.transpose(2, 0, 1)


def stage_hwc(buf, exs):
    for j, raw in enumerate(exs):
        oh, ow = raw.shape[:2]
        buf[j, oh:] = 0
        buf[j, :oh, ow:] = 0
        buf[j, :oh, :ow] = raw


def bench(fn, buf, batches):
    fn(buf, batches[0])                      # warm cache/allocs
    t0 = time.perf_counter()
    for exs in batches:
        fn(buf, exs)
    return (time.perf_counter() - t0) / len(batches) * 1e3


def main():
    rng = np.random.default_rng(0)
    batches = [make_examples(rng) for _ in range(ROUNDS)]
    chw_buf = np.zeros((B, 3, CANVAS, CANVAS), np.uint8)
    hwc_buf = np.zeros((B, CANVAS, CANVAS, 3), np.uint8)
    ms_chw = bench(stage_chw, chw_buf, batches)
    ms_hwc = bench(stage_hwc, hwc_buf, batches)
    print(f"CHW staging: {ms_chw:7.2f} ms/batch of {B}")
    print(f"HWC staging: {ms_hwc:7.2f} ms/batch of {B}")
    print(f"saving:      {ms_chw - ms_hwc:7.2f} ms/batch "
          f"({(ms_chw - ms_hwc) / B:5.2f} ms/img)")


if __name__ == "__main__":
    main()
