"""Reference-as-oracle tests: execute the reference's OWN pure-torch code
(read-only, from /root/reference) and pin our implementations against it.

Every other golden test in this suite re-derives the reference's math in
inline torch — a correlated-error risk (a misreading would live on both
sides of the assert). These tests instead import the reference modules that
need only torch:

  * src/utils/lovasz_losses.py      (lovasz_softmax, values AND gradients)
  * src/utils/render_utils.py       (ModifyLaplaceDensity)
  * src/layers/backbones/base_vampire2.py:17-78 (Unet3D / Hourglass3D,
    extracted via ast — the module itself imports mmdet)
  * src/callbacks/ema.py            (ModelEMA.update ramp; pytorch_lightning
    is stubbed — only the Callback base class is touched at import)
"""
import ast
import importlib.util
import pathlib
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn.functional as F  # noqa: F401  (exec namespace for Unet3D)
from torch import nn

import jax
import jax.numpy as jnp

REF = pathlib.Path('/root/reference')

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason='reference checkout not present')


def _import_from_path(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _load_reference_unet3d():
    """Extract the Unet3D/Hourglass3D ClassDefs from base_vampire2.py and
    exec them in a torch-only namespace (the module's own imports pull in
    mmdet, which is not installed)."""
    src = (REF / 'src/layers/backbones/base_vampire2.py').read_text()
    tree = ast.parse(src)
    wanted = [n for n in tree.body if isinstance(n, ast.ClassDef)
              and n.name in ('Unet3D', 'Hourglass3D')]
    assert len(wanted) == 2, [n.name for n in wanted]
    mod = ast.Module(body=wanted, type_ignores=[])
    ns = {'torch': torch, 'nn': nn, 'F': F}
    exec(compile(mod, str(REF / 'src/layers/backbones/base_vampire2.py'),
                 'exec'), ns)
    return ns['Unet3D']


# ---------------------------------------------------------------------------
# Lovász-softmax: values and the detached-slope gradient
# ---------------------------------------------------------------------------

def _ref_lovasz():
    return _import_from_path('ref_lovasz',
                             REF / 'src/utils/lovasz_losses.py')


def test_lovasz_value_matches_reference():
    from vampire_tpu.ops.lovasz import lovasz_softmax
    ref = _ref_lovasz()
    rng = np.random.RandomState(0)
    P, C = 257, 7
    logits = rng.randn(P, C).astype(np.float32)
    probas = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    # labels leave one class absent to exercise the classes='present' skip
    labels = rng.randint(0, C - 1, size=(P,)).astype(np.int64)

    want = ref.lovasz_softmax_flat(torch.from_numpy(probas),
                                   torch.from_numpy(labels)).item()
    got = float(lovasz_softmax(jnp.asarray(probas), jnp.asarray(labels)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_lovasz_value_matches_reference_with_ignore():
    from vampire_tpu.ops.lovasz import lovasz_softmax
    ref = _ref_lovasz()
    rng = np.random.RandomState(1)
    P, C = 300, 5
    logits = rng.randn(P, C).astype(np.float32)
    probas = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    labels = rng.randint(0, C, size=(P,)).astype(np.int64)
    valid = rng.rand(P) > 0.3
    labels_ref = labels.copy()
    labels_ref[~valid] = 255

    want = ref.lovasz_softmax(torch.from_numpy(probas),
                              torch.from_numpy(labels_ref),
                              ignore=255).item()
    got = float(lovasz_softmax(jnp.asarray(probas), jnp.asarray(labels),
                               jnp.asarray(valid)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_lovasz_gradient_matches_reference():
    """The reference detaches the Jaccard slope (lovasz_losses.py:198:
    Variable(lovasz_grad(...))); our custom VJP must route exactly that
    slope back through the sort permutation."""
    from vampire_tpu.ops.lovasz import lovasz_softmax
    ref = _ref_lovasz()
    rng = np.random.RandomState(2)
    P, C = 129, 6
    logits = rng.randn(P, C).astype(np.float32)
    probas_np = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    labels = rng.randint(0, C, size=(P,)).astype(np.int64)

    pt = torch.from_numpy(probas_np).requires_grad_(True)
    loss = ref.lovasz_softmax_flat(pt, torch.from_numpy(labels))
    loss.backward()
    want = pt.grad.numpy()

    got = np.asarray(jax.grad(
        lambda p: lovasz_softmax(p, jnp.asarray(labels)))(
            jnp.asarray(probas_np)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# ModifyLaplaceDensity
# ---------------------------------------------------------------------------

def test_laplace_density_matches_reference():
    from vampire_tpu.core.rendering import laplace_density
    ref = _import_from_path('ref_render',
                            REF / 'src/utils/render_utils.py')
    for beta, bias in ((0.1, -1.0), (0.01, -1.0), (0.3, 0.5)):
        den = ref.ModifyLaplaceDensity(beta=beta, bias=bias)
        sdf = np.linspace(-3.0, 3.0, 101).astype(np.float32)
        want = den(torch.from_numpy(sdf)).detach().numpy()
        got = np.asarray(laplace_density(jnp.asarray(sdf),
                                         jnp.asarray(beta), bias=bias))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                   err_msg=f'beta={beta} bias={bias}')


# ---------------------------------------------------------------------------
# Unet3D / Hourglass3D wiring (same injected weights, both layouts)
# ---------------------------------------------------------------------------

def _torch_unet_to_flax_params(tmod):
    """torch (Cout, Cin, kz, ky, kx) -> flax (kz, ky, kx, Cin, Cout)."""
    def k(w):
        return jnp.asarray(w.detach().numpy().transpose(2, 3, 4, 1, 0))

    params = {'init_dres': {'kernel': k(tmod.init_dres.weight)}}
    for hg_name in ('hg1', 'hg2'):
        hg = getattr(tmod, hg_name)
        params[hg_name] = {
            f'conv{i}': {'kernel': k(getattr(hg, f'conv{i}')[0].weight)}
            for i in range(1, 7)}
    return {'params': params}


@pytest.mark.parametrize('z_channels', [False, True])
def test_unet3d_matches_reference_wiring(z_channels):
    from vampire_tpu.models.unet3d import Unet3D
    RefUnet3D = _load_reference_unet3d()
    torch.manual_seed(0)
    Cin, mid, Z, Y, X = 7, 4, 5, 12, 16
    tmod = RefUnet3D(Cin, mid).eval()
    x = torch.randn(1, Cin, Z, Y, X)
    with torch.no_grad():
        want = tmod(x).permute(0, 2, 3, 4, 1).numpy()

    net = Unet3D(mid, z_channels=z_channels)
    variables = _torch_unet_to_flax_params(tmod)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    got = np.asarray(net.apply(variables, xj))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# ModelEMA decay ramp
# ---------------------------------------------------------------------------

def _load_reference_model_ema():
    # ema.py imports pytorch_lightning only for the Callback base class of
    # EMACallback; stub it so ModelEMA (pure torch) imports.
    if 'pytorch_lightning' not in sys.modules:
        pl = types.ModuleType('pytorch_lightning')
        cb = types.ModuleType('pytorch_lightning.callbacks')
        cb.Callback = object
        pl.callbacks = cb
        sys.modules['pytorch_lightning'] = pl
        sys.modules['pytorch_lightning.callbacks'] = cb
    mod = _import_from_path('ref_ema', REF / 'src/callbacks/ema.py')
    return mod.ModelEMA


def test_ema_update_matches_reference_ramp():
    from vampire_tpu.training.train_state import ema_update
    ModelEMA = _load_reference_model_ema()
    torch.manual_seed(3)
    tmod = nn.Linear(4, 3)
    ema = ModelEMA(tmod, decay=0.9999)

    ep = {'w': jnp.asarray(tmod.weight.detach().numpy()),
          'b': jnp.asarray(tmod.bias.detach().numpy())}
    rng = np.random.RandomState(4)
    for step in range(5):
        with torch.no_grad():
            tmod.weight += torch.from_numpy(
                rng.randn(3, 4).astype(np.float32) * 0.1)
            tmod.bias += torch.from_numpy(
                rng.randn(3).astype(np.float32) * 0.1)
        ema.update(None, tmod)
        p = {'w': jnp.asarray(tmod.weight.detach().numpy()),
             'b': jnp.asarray(tmod.bias.detach().numpy())}
        ep = ema_update(ep, p, jnp.asarray(step))

    np.testing.assert_allclose(np.asarray(ep['w']),
                               ema.ema.weight.detach().numpy(),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ep['b']),
                               ema.ema.bias.detach().numpy(),
                               rtol=1e-5, atol=1e-7)
