"""Root-cause probe for the B=2 serving super-linearity (VERDICT r3 #5).

r3 measured B=2 inference at 427 ms/iter vs the 318 ms linear expectation
(scripts/perf_r3_batch.py) and left the cause an untested hypothesis
("HBM-resident tables hurt"). This probe discriminates:

  H1 spill/pressure: XLA memory_analysis of the compiled forward at B=1/2
     (temp + argument + output bytes; v5e HBM is 16 GB — a generation-size
     jump in temps, or >HBM totals, means re-materialization/copies).
  H2 gather degradation: the isolated vmapped row-gather (the op that is
     62% of the frame) timed at B=1 vs B=2 with everything else absent.
     If take itself goes super-linear with 2 HBM tables, the cause is the
     gather engine; if it scales linearly, the cause is elsewhere (H1/H3).
  H3 residual: full forward timings B=1/2 with the same in-jit K-rep
     methodology (fetch constant divided away) for an honest frame pair.

Run (TPU): python scripts/perf_r4_batch2.py
"""
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def bench_fetch_corrected(f, args, K_inner=1, reps=3):
    """min wall time of f(*args) minus the measured 1-elem fetch floor."""
    import jax
    import jax.numpy as jnp
    f0 = jax.jit(lambda *a: jax.tree.leaves(a)[0].ravel()[0]
                 .astype(jnp.float32))
    float(f0(*args))
    fetch = min(_t(lambda: float(f0(*args))) for _ in range(reps))
    float(np.asarray(f(*args)).ravel()[0])
    t = min(_t(lambda: float(np.asarray(f(*args)).ravel()[0]))
            for _ in range(reps))
    return (t - fetch) / K_inner


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp
    from vampire_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from vampire_tpu.configs import flagship_config
    from vampire_tpu.data.synthetic import synthetic_batch
    from vampire_tpu.models.vampire import Vampire
    from vampire_tpu.models.centerpoint_head import decode_preds
    from vampire_tpu.training.train_step import split_mats

    cfg = flagship_config()

    # ---- H2 first (cheap compile): isolated vmapped row gather ----
    R = 21 * 257 * 257            # corner-table rows
    W = 176                       # bf16 lanes -> 352 B rows
    Q = 4_200_000                 # ~rays+lift rows per frame
    K = 4
    rng = np.random.RandomState(0)
    for B in (1, 2):
        table = jnp.asarray(rng.randn(B, R, W).astype(np.float32)
                            ).astype(jnp.bfloat16)
        idx = jnp.asarray(rng.randint(0, R, (B, Q)).astype(np.int32))

        def loop(t, ii):
            def body(k, acc):
                rows = jax.vmap(lambda tb, ib: jnp.take(
                    tb, (ib + k) % R, axis=0))(t, ii)
                # full fused reduce: a strided-slice checksum here made XLA
                # materialize a transposed copy whose layout padded the
                # size-2 batch dim to 128 lanes (a 189 GB allocation!) —
                # itself a B=2 layout hazard worth remembering
                return acc + jnp.sum(rows.astype(jnp.float32))
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        f = jax.jit(loop)
        per = bench_fetch_corrected(f, (table, idx), K_inner=K)
        print(f'H2 isolated gather B={B}: {per*1e3:7.1f} ms '
              f'({per/(B*Q)*1e9:5.2f} ns/row)', flush=True)

    # ---- H1 + H3: compiled forward analysis + honest timings ----
    model = Vampire(cfg.backbone, cfg.head, dtype=jnp.bfloat16)
    for B in (1, 2):
        batch = synthetic_batch(cfg, batch_size=B,
                                n_points=cfg.train.max_points, seed=0,
                                mode='val')
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        mats = split_mats(batch)
        variables = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), batch['imgs'], mats,
            points=batch['points'], train=False))()

        def fwd(v, imgs, m, pts):
            fo, preds = model.apply(v, imgs, m, points=pts, train=False)
            dec = decode_preds(preds, cfg.head)
            outs = (fo['occ_logits'], fo['occ_density'], fo['pts_logits'],
                    fo['depth_preds'], fo['bev_seg_logits_preds'],
                    [(d['bboxes'], d['scores'], d['labels'], d['valid'])
                     for d in dec])
            return sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree.leaves(outs))

        lowered = jax.jit(fwd).lower(variables, batch['imgs'], mats,
                                     batch['points'])
        compiled = lowered.compile()
        try:
            ma = compiled.memory_analysis()
            print(f'H1 B={B}: temp {ma.temp_size_in_bytes/1e9:.2f} GB, '
                  f'args {ma.argument_size_in_bytes/1e9:.2f} GB, '
                  f'out {ma.output_size_in_bytes/1e9:.3f} GB, '
                  f'gen {ma.generated_code_size_in_bytes/1e6:.1f} MB',
                  flush=True)
        except Exception as e:
            print(f'H1 B={B}: memory_analysis unavailable ({e})', flush=True)

        g = jax.jit(fwd)
        args = (variables, batch['imgs'], mats, batch['points'])
        per = bench_fetch_corrected(g, args)
        print(f'H3 full fwd B={B}: {per*1e3:7.1f} ms/iter '
              f'({per/B*1e3:7.1f} ms/frame)', flush=True)


if __name__ == '__main__':
    main()
