"""Space-to-depth rewrite of the encoder's full-resolution convs: the
measurement behind RESULTS.md's encoder-MFU verdict.

Round 2 measured the encoder at 42% MFU because its full-res (128x128) convs
have only 64 output channels — half the 128-wide MXU lane dimension idles.
The classic fix is space-to-depth: pack 2x2 pixels into channels so convs see
4x the channels at 1/4 the positions. This script measures BOTH halves of
that argument on the real chip:

  1. `occupancy`: time the original 3x3 64->64 conv vs the same conv with 128
     output channels (2x the FLOPs). If they take the SAME time, the lane
     occupancy claim is proven (the extra 64 lanes were idle).
  2. `s2d`: an EXACT space-to-depth rewrite (weight transform, verified
     bit-near) of the 3x3 stride-1 conv: per output subpixel (a, b), a 2x2
     conv over the packed (H/2, W/2, 4C) input with asymmetric padding.
     FLOP count: 4 subpixel convs x (2x2x4C) contraction = 16/9 the original
     MACs. The measurement shows whether the better MXU shaping (contraction
     1024 vs 576, still 64 lanes) buys back the 1.78x FLOP inflation.

Equivalence is asserted (atol 1e-4 fp32) before any timing, so the numbers
compare equal programs. Usage:
    python experiments/perf/space_to_depth.py            # TPU timing
    WX_PLATFORM=cpu python ... --check-only              # equivalence only
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

if os.environ.get("WX_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["WX_PLATFORM"])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/2, W/2, 4C); channel index = (u*2 + v)*C + c."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def packed_kernels(w: np.ndarray):
    """3x3 stride-1 SAME conv kernel (3,3,C,K) -> four 2x2 packed kernels.

    For output subpixel (a, b), original tap (di, dj) with di = 2*(s + s0)
    + u - a (s in {0,1} the packed kernel row, s0 = -1 if a == 0 else 0),
    and the packed input channel is (u*2 + v)*C + c.
    Returns {(a, b): (kernel (2,2,4C,K), pad_h, pad_w)} where pad is the
    asymmetric packed padding ((1,0) for subpixel 0, (0,1) for subpixel 1).
    """
    c, k = w.shape[2], w.shape[3]
    out = {}
    for a in (0, 1):
        for b in (0, 1):
            kp = np.zeros((2, 2, 4 * c, k), w.dtype)
            s0 = -1 if a == 0 else 0
            t0 = -1 if b == 0 else 0
            for s in (0, 1):
                for u in (0, 1):
                    di = 2 * (s + s0) + u - a
                    if not -1 <= di <= 1:
                        continue
                    for tt in (0, 1):
                        for v in (0, 1):
                            dj = 2 * (tt + t0) + v - b
                            if not -1 <= dj <= 1:
                                continue
                            kp[s, tt, (u * 2 + v) * c:(u * 2 + v + 1) * c, :] \
                                = w[di + 1, dj + 1, :, :]
            pad_h = (1, 0) if a == 0 else (0, 1)
            pad_w = (1, 0) if b == 0 else (0, 1)
            out[(a, b)] = (jnp.asarray(kp), pad_h, pad_w)
    return out


def conv_ref(x, w):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(x, w, (1, 1), ((1, 1), (1, 1)),
                                    dimension_numbers=dn)


def conv_s2d(xp, packs):
    """Packed input (N, H/2, W/2, 4C) -> packed output (N, H/2, W/2, 4K)."""
    outs = {}
    for (a, b), (kp, ph, pw) in packs.items():
        dn = lax.conv_dimension_numbers(xp.shape, kp.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        outs[(a, b)] = lax.conv_general_dilated(
            xp, kp, (1, 1), (ph, pw), dimension_numbers=dn)
    # packed channel order (a*2+b)*K + k, matching space_to_depth
    return jnp.concatenate([outs[(0, 0)], outs[(0, 1)],
                            outs[(1, 0)], outs[(1, 1)]], axis=-1)


def depth_to_space(y: jnp.ndarray) -> jnp.ndarray:
    n, hh, ww, c4 = y.shape
    c = c4 // 4
    y = y.reshape(n, hh, ww, 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * hh, 2 * ww, c)


def check_equivalence(seed=0, n=2, hw=32, c=8, k=8):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, hw, hw, c)).astype(np.float32))
    w = rng.standard_normal((3, 3, c, k)).astype(np.float32) * 0.1
    want = conv_ref(x, jnp.asarray(w))
    got = depth_to_space(conv_s2d(space_to_depth(x), packed_kernels(w)))
    err = float(jnp.max(jnp.abs(got - want)))
    assert err < 1e-4, f"s2d rewrite NOT equivalent: max err {err}"
    print(f"equivalence OK (max abs err {err:.2e})")


def bench_variant(fn, x, reps=20, tag=""):
    # the reduction lives INSIDE the jitted program so the host read-back is
    # one scalar — an eager sum outside jit would add output-size-dependent
    # transfer/dispatch cost and bias the comparison
    f = jax.jit(lambda x_: jnp.sum(fn(x_).astype(jnp.float32)))
    float(f(x))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(x))  # scalar host read-back: the reliable axon sync
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    print(f"{tag}: {t * 1e3:.3f} ms")
    return t


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--check-only", action="store_true")
    p.add_argument("--n", type=int, default=832,
                   help="batch (bench encode folds B*T_in = 64*13 = 832)")
    p.add_argument("--hw", type=int, default=128)
    p.add_argument("--c", type=int, default=64)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    check_equivalence()
    if args.check_only:
        return

    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal(
        (args.n, args.hw, args.hw, args.c)).astype(np.float32).astype(dt))
    w64 = rng.standard_normal((3, 3, args.c, args.c)).astype(np.float32) * 0.05
    w128 = rng.standard_normal((3, 3, args.c, 2 * args.c)
                               ).astype(np.float32) * 0.05
    packs = {ab: (kp.astype(dt), ph, pw)
             for ab, (kp, ph, pw) in packed_kernels(w64).items()}
    k64 = jnp.asarray(w64).astype(dt)
    k128 = jnp.asarray(w128).astype(dt)

    n_pos = args.n * args.hw * args.hw
    macs64 = n_pos * 9 * args.c * args.c
    t_a = bench_variant(lambda x_: conv_ref(x_, k64), x, tag=f"3x3 {args.c}->{args.c} (original)")
    t_b = bench_variant(lambda x_: conv_ref(x_, k128), x, tag=f"3x3 {args.c}->{2*args.c} (2x FLOPs, full lanes)")
    xp = space_to_depth(x)
    t_c = bench_variant(lambda x_: conv_s2d(x_, packs), xp, tag="s2d exact rewrite (1.78x MACs)")
    t_c_full = bench_variant(
        lambda x_: depth_to_space(conv_s2d(space_to_depth(x_), packs)), x,
        tag="s2d rewrite incl. pack/unpack")
    print(f"\nMACs original: {macs64/1e9:.1f} G; effective TFLOP/s: "
          f"orig {2*macs64/t_a/1e12:.1f}, 2x-ch {4*macs64/t_b/1e12:.1f}, "
          f"s2d {2*macs64*16/9/t_c/1e12:.1f} (useful: {2*macs64/t_c/1e12:.1f})")
    print(f"occupancy evidence: 2x-FLOP conv costs {t_b/t_a:.2f}x the time "
          f"(1.0 == half the lanes were idle)")
    print(f"s2d verdict: {'WIN' if t_c_full < t_a else 'LOSS'} "
          f"({t_c_full/t_a:.2f}x original conv time)")


if __name__ == "__main__":
    main()
