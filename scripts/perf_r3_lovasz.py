"""Lovász backward-cost microbenchmark (train-step plan: sorts ~182 ms).

The reference detaches the Jaccard slope (lovasz_losses.py: torch.dot(
errors_sorted, Variable(grad))), so d loss / d errors is exactly the slope
vector routed back through the sort permutation — no differentiation
through the sort is needed. Candidate: a custom_vjp lovasz whose FORWARD
computes that cotangent directly (slope reordered to unsorted positions via
one extra (perm, slope) sort) and whose backward is a multiply — replacing
whatever jax's sort-JVP machinery does (iota-payload sort + gather +
scatter transpose).

Measures value AND grad of the current lovasz_softmax vs the manual-vjp
variant at the occ shape (640K x 18) and the compacted cam-seg shape.

Run: python scripts/perf_r3_lovasz.py  (real TPU)
"""
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def timeit(fn, args_list, iters=6, warmup=2):
    import jax
    for i in range(warmup):
        np.asarray(jax.tree.leaves(
            fn(*args_list[i % len(args_list)]))[0].ravel()[:1])
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = fn(*args_list[i % len(args_list)])
        for x in jax.tree.leaves(out):
            np.asarray(x.ravel()[:1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp
    from vampire_tpu.ops.lovasz import lovasz_softmax, _lovasz_grad

    def lovasz_manual(probas, labels, valid=None):
        """lovasz_softmax with a hand-rolled VJP (slope is detached)."""
        P, C = probas.shape
        probas = probas.astype(jnp.float32)
        vf = (jnp.ones((P,), jnp.float32) if valid is None
              else valid.astype(jnp.float32))

        fg = (labels[None, :] == jnp.arange(C)[:, None]).astype(
            jnp.float32) * vf
        present = jnp.sum(fg, axis=-1) > 0
        n_present = jnp.maximum(jnp.sum(present.astype(jnp.float32)), 1.0)
        w = present.astype(jnp.float32) / n_present            # (C,)

        @jax.custom_vjp
        def inner(errors):
            return _inner_fwd(errors)[0]

        def _inner_fwd(errors):
            iota = jnp.broadcast_to(jnp.arange(errors.shape[-1],
                                               dtype=jnp.int32),
                                    errors.shape)
            neg_sorted, fg_sorted, perm = jax.lax.sort(
                (-errors, fg, iota), dimension=-1, num_keys=1)
            slope = _lovasz_grad(fg_sorted)                    # (C, P) const
            loss = jnp.sum(jnp.sum(-neg_sorted * slope, axis=-1) * w)
            # route the detached slope back to unsorted positions: sorting
            # (perm, slope) by perm ascending IS the inverse permutation
            _, derr = jax.lax.sort((perm, slope * w[:, None]),
                                   dimension=-1, num_keys=1)
            return loss, derr

        def _inner_bwd(derr, g):
            return (g * derr,)

        inner.defvjp(_inner_fwd, _inner_bwd)
        errors = jnp.abs(fg - probas.T) * vf
        return inner(errors)

    rng = np.random.RandomState(0)
    shapes = [('occ 640K x 18', 640_000, 18), ('camseg 25K x 18', 24576, 18)]
    for name, P, C in shapes:
        logits = jnp.asarray(rng.randn(P, C).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, C, P).astype(np.int32))
        valid = jnp.asarray((rng.rand(P) < 0.4))

        def val_and_grad(fn):
            def f(lg):
                pr = jax.nn.softmax(lg, axis=-1)
                return fn(pr, labels, valid)
            return jax.jit(jax.value_and_grad(f))

        fa = val_and_grad(lovasz_softmax)
        fb = val_and_grad(lovasz_manual)
        args = [(logits + 0.001 * i,) for i in range(3)]
        ta = timeit(fa, args)
        tb = timeit(fb, args)

        va, ga = fa(logits)
        vb, gb = fb(logits)
        dv = abs(float(va) - float(vb))
        dg = float(jnp.max(jnp.abs(ga - gb)))
        print(f'[{name}] current {ta*1e3:7.2f} ms  manual-vjp {tb*1e3:7.2f} '
              f'ms  dvalue {dv:.2e}  dgrad {dg:.2e}', flush=True)


if __name__ == '__main__':
    main()
