"""A/B the gradient-accumulating microbatch step at large batch (VERDICT r3
#1: throughput FELL 11.2k -> 9.5k -> 8.8k mols/s at batch 256/1024/2048).

Round-4 trace analysis (benchmarks/trace_compare.py over trace_step.py runs
at 256 vs 1024) showed same-named pair-tensor fusions running 9-17x slower
for 4x the bytes: at batch 256 the 16 MB [B,N,N,32] tensors carry S(1)
(VMEM alternate-memory) layouts; at 1024 (67 MB) they spill to HBM.  The
fix is lax.scan gradient accumulation over VMEM-sized chunks inside ONE
device program (pretrain/train_step.py::make_pretrain_step, cfg.microbatch).

Usage:  python benchmarks/bench_microbatch.py [BATCH [MB ...]]
   or:  python benchmarks/bench_microbatch.py B1:MB1[:SCOPE] B2:MB2[:SCOPE] ...
Defaults: BATCH=1024, MB in {0, 256}.  SCOPE is `step` (whole-step gradient
accumulation, the default) or `score` (microbatch_scope='score': only the
two SDE losses chunked, encoders + contrastive at full batch).
Sync-mode timing per bench.py.

First sweep (v5e-1, n_max 32, emb 300), batch 1024:
  mb=0: 110.7 ms/step -> 9,251 mols/s   (the r3 inverted-curve point)
  mb=256: 85.2 ms -> 12,013   mb=128: 76.6 ms -> 13,368
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from moleculesde_tpu.data.synthetic import synthetic_compact_batch
from moleculesde_tpu.pretrain import (
    PretrainConfig, create_pretrain_state, make_pretrain_step)


def main():
    if any(":" in a for a in sys.argv[1:]):
        pairs = []
        for a in sys.argv[1:]:
            parts = a.split(":")
            scope = parts[2] if len(parts) > 2 else "step"
            pairs.append((int(parts[0]), int(parts[1]), scope))
    else:
        batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
        mbs = [int(x) for x in sys.argv[2:]] or [0, 256]
        pairs = [(batch_size, mb, "step") for mb in mbs]
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    coeff = jnp.asarray(1.0)
    results = {}
    batches = {}
    for batch_size, mb, scope in pairs:
        if batch_size not in batches:
            batches[batch_size] = jax.device_put(synthetic_compact_batch(
                num_graphs=batch_size, n_max=32, seed=2))
        batch = batches[batch_size]
        cfg = PretrainConfig(emb_dim=300, dropout_ratio=0.0,
                             cl_similarity_metric="EBM_node_dot_prod",
                             microbatch=mb, microbatch_scope=scope)
        tag = f"B={batch_size} mb={mb} scope={scope}"
        t0 = time.time()
        models, state = create_pretrain_state(cfg, batch, key)
        step = make_pretrain_step(models, cfg)
        state, m = step(state, batch, key, coeff)
        loss0 = float(m["loss"])  # sync-mode switch + drain
        print(f"{tag}: compile {time.time() - t0:.1f}s  "
              f"loss {loss0:.4f}", flush=True)
        steps = 30
        t0 = time.time()
        for _ in range(steps):
            state, m = step(state, batch, key, coeff)
        float(m["loss"])
        dt = time.time() - t0
        rate = batch_size * steps / dt
        results[(batch_size, mb, scope)] = rate
        print(f"{tag}: {1e3 * dt / steps:.1f} ms/step -> "
              f"{rate:.0f} mols/s", flush=True)
        del models, state, step, m
    print({f"{b}:{mb}:{s}": round(r) for (b, mb, s), r in results.items()},
          flush=True)


if __name__ == "__main__":
    main()
