"""Hardware shoot-out: fused Pallas NT-Xent vs the XLA closed form.

Measures value+grad time of the contrastive loss alone at global batch
sizes 2B in {1024, 4096, 16384} (D=256, the production projection width),
i.e. the single-chip production point and two pod-scale global batches.

Methodology (CLAUDE.md): the axon relay's block_until_ready is not a
barrier and dispatch overhead is variable, so each timing is the MARGINAL
time between two lax.scan lengths with a host readback as the barrier.
The scan carry perturbs the input so XLA cannot hoist the body.

Usage (one TPU attach; exits cleanly):
    python runs/bench_ntxent.py [--sizes 1024,4096,16384] [--d 256]
                                [--masked] [--k1 4] [--k2 20] [--reps 5]

Results recorded in docs/DESIGN.md "Fused NT-Xent Pallas kernel".
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(*a):
    print(*a, flush=True)


def marginal_time(fn, k1, k2, reps):
    """fn(k) runs a k-step scan and returns a device scalar."""
    import numpy as np

    meds = {}
    for k in (k1, k2):
        _ = np.asarray(fn(k))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(k)
            _ = np.asarray(out)  # readback barrier
            ts.append(time.perf_counter() - t0)
        meds[k] = float(np.median(ts))
    return (meds[k2] - meds[k1]) / (k2 - k1)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="1024,4096,16384",
                   help="comma-separated 2B values (multiples of 128)")
    p.add_argument("--d", type=int, default=256)
    p.add_argument("--masked", action="store_true",
                   help="use a pair_mask with 7/8 of pairs valid")
    p.add_argument("--k1", type=int, default=4)
    p.add_argument("--k2", type=int, default=20)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from functools import partial

    import jax.numpy as jnp

    from molclr_tpu.losses import nt_xent_loss
    from molclr_tpu.ops.pallas_ntxent import nt_xent_pallas

    log(f"device: {jax.devices()[0]}")
    interpret = jax.devices()[0].platform == "cpu"

    for n in (int(s) for s in args.sizes.split(",")):
        b = n // 2
        key = jax.random.PRNGKey(n)
        zi = jax.random.normal(key, (b, args.d), jnp.float32)
        zj = jax.random.normal(jax.random.fold_in(key, 1), (b, args.d),
                               jnp.float32)
        if args.masked:
            mask = (jnp.arange(b) % 8 != 7).astype(jnp.float32)
        else:
            mask = None

        def xla_loss(zi, zj):
            return nt_xent_loss(zi, zj, 0.1, True, pair_mask=mask)

        def pallas_loss(zi, zj):
            return nt_xent_pallas(zi, zj, 0.1, True, pair_mask=mask,
                                  interpret=interpret)

        results = {}
        for name, loss in (("xla", xla_loss), ("pallas", pallas_loss)):
            vg = jax.value_and_grad(loss, argnums=(0, 1))

            @partial(jax.jit, static_argnums=1)
            def scan_fn(z0, k, vg=vg):
                def body(c, i):
                    # perturb by the carry so iterations serialize and
                    # nothing is loop-invariant
                    l, (gi, gj) = vg(zi + 1e-6 * c * gi_like,
                                     zj + 1e-6 * c * gj_like)
                    # keep the grads live (a 0.0 factor would be DCE'd)
                    return l + 1e-12 * (gi.sum() + gj.sum()), None

                gi_like = jnp.ones_like(zi)
                gj_like = jnp.ones_like(zj)
                out, _ = jax.lax.scan(body, z0,
                                      jnp.arange(k, dtype=jnp.int32))
                return out

            t = marginal_time(lambda k: scan_fn(jnp.float32(0.0), k),
                              args.k1, args.k2, args.reps)
            results[name] = t
            val = float(xla_loss(zi, zj)) if name == "xla" else \
                float(pallas_loss(zi, zj))
            log(f"2B={n:6d} {name:7s} value+grad marginal "
                f"{t*1e6:9.1f} us   (loss {val:.4f})")
        log(f"2B={n:6d} ratio xla/pallas = "
            f"{results['xla'] / results['pallas']:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
