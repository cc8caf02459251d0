"""A/B timing of full pretrain-step variants in one TPU process.

Development tool: builds the jitted step for each named config override,
times it with the honest sync recipe (CLAUDE.md: close every window with a
trailing scalar read — block_until_ready returns at enqueue on this
tunnel), and prints ms/step per variant.  One process = one TPU claim.

Usage: AB_BATCH=256 python benchmarks/ab_step.py 'name=field:value,...' ...
With no args, runs the default comparison set.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from moleculesde_tpu.data.synthetic import synthetic_compact_batch
from moleculesde_tpu.pretrain import (
    PretrainConfig, create_pretrain_state, make_pretrain_step)

BATCH = int(os.environ.get("AB_BATCH", 256))
N_MAX = int(os.environ.get("AB_NMAX", 32))
EMB = int(os.environ.get("AB_EMB", 300))
REPS = int(os.environ.get("AB_REPS", 30))


def parse_variants(argv):
    if not argv:
        return [("baseline", {}),
                ("attn_wide", {"attn_impl_3dto2d": "wide"})]
    out = []
    for spec in argv:
        name, _, rest = spec.partition("=")
        overrides = {}
        if rest:
            for kv in rest.split(","):
                kk, _, vv = kv.partition(":")
                if vv in ("True", "False"):
                    vv = vv == "True"
                else:
                    try:
                        vv = int(vv)
                    except ValueError:
                        try:
                            vv = float(vv)
                        except ValueError:
                            pass
                overrides[kk] = vv
        out.append((name, overrides))
    return out


def main():
    variants = parse_variants(sys.argv[1:])
    print(f"devices: {jax.devices()}  B={BATCH} N={N_MAX} emb={EMB} "
          f"reps={REPS}")
    batch = jax.device_put(
        synthetic_compact_batch(num_graphs=BATCH, n_max=N_MAX, seed=0))
    key = jax.random.PRNGKey(0)
    coeff = jnp.asarray(1.0)

    results = []
    for name, overrides in variants:
        overrides = dict(overrides)
        if "attend_flat" in overrides:  # module-level experiment flag
            import moleculesde_tpu.models.score_2d3d as s23
            s23.ATTEND_FLAT = bool(overrides.pop("attend_flat"))
        cfg = PretrainConfig(emb_dim=EMB, dropout_ratio=0.0,
                             cl_similarity_metric="EBM_node_dot_prod",
                             **overrides)
        t0 = time.time()
        models, state = create_pretrain_state(cfg, batch, key)
        step = make_pretrain_step(models, cfg)
        state, m = step(state, batch, key, coeff)
        # force the synchronous-dispatch regime + finish compile
        loss0 = float(m["loss"])
        print(f"[{name}] compile+first step {time.time() - t0:.1f}s "
              f"loss={loss0:.4f}", flush=True)
        # honest window: trailing scalar read closes it
        t0 = time.time()
        for _ in range(REPS):
            state, m = step(state, batch, key, coeff)
        _ = float(m["loss"])
        dt = (time.time() - t0) / REPS
        results.append((name, dt))
        print(f"[{name}] {dt * 1e3:.2f} ms/step "
              f"({BATCH / dt:.0f} mols/s)", flush=True)
        del state, step, models

    print("\n== summary ==")
    base = results[0][1]
    for name, dt in results:
        print(f"{name:24s} {dt * 1e3:8.2f} ms/step  ({base / dt:.3f}x)")


if __name__ == "__main__":
    main()
