"""Multi-device tests on the 8-device virtual CPU mesh: DP equivalence,
halo-exchange FTCS vs unsharded, all_to_all ADI vs unsharded."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_pde_tpu.data import load_dataset
from cnn_pde_tpu.models import MNISTClassifier
from cnn_pde_tpu.ops import ftcs_evolve, sweep_x, sweep_y
from cnn_pde_tpu.parallel import (
    adi_strang_step_spatial,
    ftcs_evolve_spatial,
    make_dp_train_step,
    make_mesh,
    replicate,
    shard_batch,
)
from cnn_pde_tpu.train import build_optimizer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_mesh_shapes():
    m = make_mesh(spatial=1)
    assert m.devices.shape == (8, 1, 1)
    m2 = make_mesh(data=2, spatial=4)
    assert m2.devices.shape == (2, 4, 1)


def test_ftcs_spatial_matches_unsharded(rng):
    mesh = make_mesh(data=1, spatial=4)
    B, H, W = 3, 48, 48
    u = jnp.asarray(rng.standard_normal((B, H, W)).astype(np.float32))
    alpha = jnp.asarray(rng.random((H, W)).astype(np.float32) * 0.1)
    beta = jnp.asarray(rng.random((H, W)).astype(np.float32) * 0.1)

    ref = ftcs_evolve(u, alpha, beta, nt=7)
    out = ftcs_evolve_spatial(mesh, u, alpha, beta, nt=7)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("smooth", [False, True])
def test_adi_spatial_matches_unsharded(rng, smooth):
    mesh = make_mesh(data=1, spatial=4)
    B, H, W = 2, 32, 32
    dt, eps = 0.01, 1e-6
    u = jnp.asarray(rng.standard_normal((B, H, W)).astype(np.float32))
    alpha = jnp.asarray(rng.random((H, W)).astype(np.float32) + 0.2)
    beta = jnp.asarray(rng.random((H, W)).astype(np.float32) + 0.2)

    ref = sweep_x(u, alpha, dt / 2, 1.0, smooth=smooth, eps=eps)
    ref = sweep_y(ref, beta, dt, 1.0, smooth=smooth, eps=eps)
    ref = sweep_x(ref, alpha, dt / 2, 1.0, smooth=smooth, eps=eps)

    out = adi_strang_step_spatial(mesh, u, alpha, beta, dt=dt,
                                  smooth=smooth, eps=eps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_spatial_model_matches_unsharded(rng, key):
    """SpatialFTCSClassifier (H sharded over 4 devices) must produce the same
    logits as the plain EmotionClassifier with identical weights."""
    from cnn_pde_tpu.models import EmotionClassifier
    from cnn_pde_tpu.parallel import SpatialFTCSClassifier

    mesh = make_mesh(data=2, spatial=4)
    smodel = SpatialFTCSClassifier(mesh, img_size=48)
    params, state = smodel.init(key)
    ref_model = EmotionClassifier(img_size=48)
    x = jnp.asarray(rng.random((4, 1, 48, 48)).astype(np.float32))

    logits_s, _ = smodel(params, state, x)
    logits_r, _ = ref_model(params, state, x)
    np.testing.assert_allclose(np.asarray(logits_s), np.asarray(logits_r),
                               rtol=5e-4, atol=1e-3)  # CFL-amplified values

    # one jit'd train step over data×spatial with grads into the 6 PDE scalars
    def loss(p):
        y, _ = smodel(p, state, x)
        return jnp.mean(y**2)

    g = jax.jit(jax.grad(loss))(params)
    assert np.abs(np.asarray(g["diff"]["alpha_w1"])) > 0
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


def test_dp_train_step_matches_single_device(key):
    """One DP step over 8 devices == one single-device step on the same batch."""
    ds = load_dataset("mnist", "/nonexistent", synthetic_ok=True,
                      synthetic_train_per_class=5, synthetic_test_per_class=2)
    model = MNISTClassifier()
    params, state = model.init(key)
    opt = build_optimizer(params, lambda s: 1e-3, clip_norm=1.0)
    opt_state = opt.init(params)

    images, labels = next(iter(ds.train_batches(16, seed=0)))
    images, labels = jnp.asarray(images), jnp.asarray(labels)
    rng = jax.random.PRNGKey(0)

    # single-device reference (dropout has a fixed rng → deterministic)
    from cnn_pde_tpu.nn import Ctx
    from cnn_pde_tpu.train import cross_entropy
    import optax

    def loss_fn(p):
        logits, new_state = model.apply(p, state, images,
                                        Ctx(train=True, rng=rng))
        return cross_entropy(logits, labels, 0.1), new_state

    (loss_ref, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, _ = opt.update(grads, opt_state, params)
    params_ref = optax.apply_updates(params, updates)

    mesh = make_mesh(spatial=1)  # 8-way DP
    step = make_dp_train_step(model, opt, mesh, label_smoothing=0.1)
    p_r = replicate(mesh, params)
    s_r = replicate(mesh, state)
    o_r = replicate(mesh, opt_state)
    imgs_s, labels_s = shard_batch(mesh, (images, labels))
    new_params, _, _, loss = step(p_r, s_r, o_r, imgs_s, labels_s, rng)

    assert abs(float(loss) - float(loss_ref)) < 1e-5
    # first-step AdamW divides by sqrt(v)+eps with v≈0, amplifying benign
    # grad reduction-order noise; 5e-5 on params is the realistic bound
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), new_params, params_ref)
    assert max(jax.tree_util.tree_leaves(diff)) < 5e-5


def test_tridiag_partitioned_matches_unsharded(rng):
    """Substructuring solve along a sharded axis == plain tridiag_solve."""
    from functools import partial
    from jax.sharding import PartitionSpec
    from cnn_pde_tpu.ops import tridiag_solve
    from cnn_pde_tpu.parallel import tridiag_solve_partitioned

    mesh = make_mesh(data=1, spatial=8)
    F, B, N = 6, 4, 64  # batch-free (F, N) coefficients, batched (B, F, N) rhs
    lo = rng.random((F, N)).astype(np.float32)
    a = jnp.asarray(-lo)
    c = jnp.asarray(-rng.random((F, N)).astype(np.float32))
    b = 1.0 + jnp.abs(a) + jnp.abs(c)  # diagonally dominant
    d = jnp.asarray(rng.standard_normal((B, F, N)).astype(np.float32))

    ref = tridiag_solve(a, b, c, d)
    sp = PartitionSpec(None, "spatial")
    fn = jax.jit(jax.shard_map(
        partial(tridiag_solve_partitioned, axis_name="spatial"),
        mesh=mesh,
        in_specs=(sp, sp, sp, PartitionSpec(None, None, "spatial")),
        out_specs=PartitionSpec(None, None, "spatial")))
    out = fn(a, b, c, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("smooth", [False, True])
def test_adi_partitioned_matches_unsharded(rng, smooth):
    """Strang step solving straight through the sharded H axis (no
    all_to_all) == the unsharded x/y/x sweeps."""
    from cnn_pde_tpu.parallel import adi_strang_step_partitioned

    mesh = make_mesh(data=1, spatial=4)
    B, H, W = 2, 32, 32
    dt, eps = 0.01, 1e-6
    u = jnp.asarray(rng.standard_normal((B, H, W)).astype(np.float32))
    alpha = jnp.asarray(rng.random((H, W)).astype(np.float32) + 0.2)
    beta = jnp.asarray(rng.random((H, W)).astype(np.float32) + 0.2)

    ref = sweep_x(u, alpha, dt / 2, 1.0, smooth=smooth, eps=eps)
    ref = sweep_y(ref, beta, dt, 1.0, smooth=smooth, eps=eps)
    ref = sweep_x(ref, alpha, dt / 2, 1.0, smooth=smooth, eps=eps)

    out = adi_strang_step_partitioned(mesh, u, alpha, beta, dt=dt,
                                      smooth=smooth, eps=eps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_adi_partitioned_grads_match_unsharded(rng):
    """The partitioned path is differentiable and its coefficient-field
    gradients match the unsharded sweeps."""
    from cnn_pde_tpu.parallel import adi_strang_step_partitioned

    mesh = make_mesh(data=1, spatial=4)
    B, H, W = 2, 16, 16
    dt, eps = 0.01, 1e-6
    u = jnp.asarray(rng.standard_normal((B, H, W)).astype(np.float32))
    alpha = jnp.asarray(rng.random((H, W)).astype(np.float32) + 0.2)
    beta = jnp.asarray(rng.random((H, W)).astype(np.float32) + 0.2)
    gw = jnp.asarray(rng.random((B, H, W)).astype(np.float32))

    def loss_ref(al, be):
        x = sweep_x(u, al, dt / 2, 1.0, smooth=True, eps=eps)
        x = sweep_y(x, be, dt, 1.0, smooth=True, eps=eps)
        x = sweep_x(x, al, dt / 2, 1.0, smooth=True, eps=eps)
        return jnp.sum(x * gw)

    def loss_p(al, be):
        x = adi_strang_step_partitioned(mesh, u, al, be, dt=dt,
                                        smooth=True, eps=eps)
        return jnp.sum(x * gw)

    gr = jax.grad(loss_ref, argnums=(0, 1))(alpha, beta)
    gp = jax.grad(loss_p, argnums=(0, 1))(alpha, beta)
    for name, x, y in zip(["alpha", "beta"], gp, gr):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-5,
            err_msg=f"partitioned-ADI grad mismatch for {name}")


def test_laplacian_spatial_matches_unsharded(rng):
    """Sharded conv-Laplacian step (ppermute halo rows, zero global edges)
    == the unsharded K8 kernel."""
    from cnn_pde_tpu.ops.stencil import laplacian_step
    from cnn_pde_tpu.parallel import laplacian_step_spatial

    mesh = make_mesh(data=1, spatial=4)
    B, C, H, W = 2, 3, 64, 64
    u = jnp.asarray(rng.standard_normal((B, C, H, W)).astype(np.float32))
    coeff = jnp.asarray(rng.random(C).astype(np.float32) * 0.1)

    ref = laplacian_step(u, coeff, dt=0.01)
    out = laplacian_step_spatial(mesh, u, coeff, dt=0.01)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_spatial_tiny_model_matches_unsharded(rng, key):
    """The FULL 64×64 TinyImageNetClassifier (ResidualDiffusion front-end +
    ResNet backbone) with H sharded over 'spatial' must produce the same
    logits as the unsharded model, and one spatially-sharded train step must
    run (VERDICT r2 #4 / SURVEY §2.6 item 2's named target map)."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cnn_pde_tpu.models import TinyImageNetClassifier
    from cnn_pde_tpu.nn import Ctx
    from cnn_pde_tpu.parallel import SpatialTinyImageNetClassifier
    from cnn_pde_tpu.train import build_optimizer, cross_entropy

    mesh = make_mesh(data=2, spatial=4)
    num_classes = 20
    m_ref = TinyImageNetClassifier(num_classes=num_classes)
    m_sp = SpatialTinyImageNetClassifier(mesh, num_classes=num_classes)
    params, state = m_ref.init(key)
    x = jnp.asarray(rng.standard_normal((4, 3, 64, 64)).astype(np.float32))

    ref = jax.jit(lambda p, x: m_ref.apply(p, state, x, Ctx(train=False))[0]
                  )(params, x)
    batch_s = NamedSharding(mesh, P("data", None, "spatial", None))
    out = jax.jit(lambda p, x: m_sp.apply(p, state, x, Ctx(train=False))[0],
                  in_shardings=(None, batch_s))(params, jax.device_put(x, batch_s))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # one full train step with H over 'spatial' and the batch over 'data'
    opt = build_optimizer(params, lambda s: 1e-3, clip_norm=1.0)
    opt_state = opt.init(params)
    labels = jnp.asarray(rng.integers(0, num_classes, 4).astype(np.int32))

    def train_step(p, o, images, labels, rng):
        def loss_fn(p):
            logits, _ = m_sp.apply(p, state, images, Ctx(train=True, rng=rng))
            return cross_entropy(logits, labels, 0.1)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    rep = NamedSharding(mesh, P())
    step = jax.jit(train_step,
                   in_shardings=(rep, rep, batch_s,
                                 NamedSharding(mesh, P("data")), rep),
                   out_shardings=(rep, rep, rep))
    p2, _, loss = step(params, opt_state, jax.device_put(x, batch_s),
                       jax.device_put(labels, NamedSharding(mesh, P("data"))),
                       jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # the PDE coefficients actually received gradient through the sharded path
    assert not np.allclose(np.asarray(p2["diff"]["alpha_base"]),
                           np.asarray(params["diff"]["alpha_base"]))


def test_train_cli_spatial_flag(monkeypatch, capsys):
    """`python -m cnn_pde_tpu.train --spatial 2` must build the
    data x spatial mesh, wrap the preset model in its spatially-sharded
    composition, and train end-to-end (the user-facing surface over
    parallel/spatial_model.py)."""
    import json
    import sys

    from cnn_pde_tpu.train.__main__ import main

    monkeypatch.setattr(sys, "argv", [
        "train", "--preset", "emotion", "--synthetic", "--epochs", "1",
        "--steps", "2", "--batch-size", "8", "--spatial", "2", "--quiet",
        "--no-preemption-handler"])
    main()
    out = capsys.readouterr().out
    assert "data=4 x spatial=2" in out, out
    result = json.loads(out.strip().splitlines()[-1])
    assert result["preset"] == "emotion"
    assert 0.0 <= result["best_acc"] <= 100.0


def test_device_epoch_under_dp_mesh(key):
    """device_epoch + DP mesh: the scanned epoch with batches sharded over
    'data' must match the single-device device_epoch run."""
    from cnn_pde_tpu.data import load_dataset
    from cnn_pde_tpu.models import MNISTClassifier
    from cnn_pde_tpu.train import TrainConfig, Trainer

    ds = load_dataset("mnist", "/nonexistent", synthetic_ok=True,
                      synthetic_train_per_class=10, synthetic_test_per_class=2)
    model = MNISTClassifier()

    def run(mesh):
        cfg = TrainConfig(epochs=1, batch_size=16, log_every=10**9,
                          device_epoch=True)
        trainer = Trainer(model, cfg, lambda s: 1e-3, mesh=mesh)
        state = trainer.init_state(key, None)
        stats = trainer.train_epoch(state, ds, 0, verbose=False)
        return state, stats

    s_ref, h_ref = run(None)
    s_dp, h_dp = run(make_mesh(spatial=1))  # 8-way DP
    assert s_ref.step == s_dp.step == 6
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-5)
    assert abs(h_ref["loss"] - h_dp["loss"]) < 1e-4


def test_device_eval_under_dp_mesh(key):
    """The scanned one-dispatch eval must also run under a DP mesh and match
    the meshless device eval exactly."""
    from cnn_pde_tpu.data import load_dataset
    from cnn_pde_tpu.models import MNISTClassifier
    from cnn_pde_tpu.train import TrainConfig, Trainer

    ds = load_dataset("mnist", "/nonexistent", synthetic_ok=True,
                      synthetic_train_per_class=4, synthetic_test_per_class=5)
    model = MNISTClassifier()
    cfg = TrainConfig(batch_size=16, device_epoch=True)
    state = Trainer(model, cfg, lambda s: 1e-3).init_state(key, None)

    ev_ref = Trainer(model, cfg, lambda s: 1e-3).evaluate(state, ds)
    ev_dp = Trainer(model, cfg, lambda s: 1e-3,
                    mesh=make_mesh(spatial=1)).evaluate(state, ds)
    assert ev_ref["acc"] == ev_dp["acc"]
    np.testing.assert_array_equal(ev_ref["predictions"], ev_dp["predictions"])


# ---------------------------------------------------------------------------
# Communication-shape certification (VERDICT r3 item 4): beyond values-equal,
# assert each sharded kernel COMPILES to exactly the collectives its design
# promises — the strongest multi-chip statement available without hardware
# (the same HLO runs the same collective schedule on real ICI).

def _audit(fn, *args):
    from cnn_pde_tpu.parallel.hlo_audit import collective_counts, compile_text
    return collective_counts(compile_text(fn, *args))


def test_hlo_ftcs_spatial_collective_shape(rng):
    """The halo-exchange FTCS evolution lowers to exactly ONE ppermute pair
    (from-prev + from-next, inside the once-compiled scan body) and no
    full-tensor collective of any other kind."""
    from functools import partial

    mesh = make_mesh(data=1, spatial=8)
    u = jnp.asarray(rng.standard_normal((4, 48, 48)).astype(np.float32))
    ab = jnp.asarray(rng.random((48, 48)).astype(np.float32) * 0.1)
    c = _audit(partial(ftcs_evolve_spatial, mesh, nt=10), u, ab, ab)
    assert c["collective-permute"] == 2, c
    assert c["all-gather"] == c["all-to-all"] == c["all-reduce"] == 0, c


def test_hlo_adi_spatial_collective_shape(rng):
    """The Ulysses-style ADI step lowers to exactly THREE all_to_alls (state
    H->W, coefficient H->W, state W->H) and nothing else — the solve axis
    never crosses devices."""
    from functools import partial

    mesh = make_mesh(data=1, spatial=8)
    u = jnp.asarray(rng.standard_normal((4, 48, 48)).astype(np.float32))
    ab = jnp.asarray(rng.random((48, 48)).astype(np.float32) + 0.2)
    c = _audit(partial(adi_strang_step_spatial, mesh, dt=0.01), u, ab, ab)
    assert c["all-to-all"] == 3, c
    assert c["all-gather"] == c["collective-permute"] == c["all-reduce"] == 0, c


def test_hlo_adi_partitioned_collective_shape(rng):
    """The substructured solve lowers to exactly TWO all_gathers whose
    payload is the O(S·B·W) interface system — independent of the sharded
    extent H (compiled at H=48 and H=96, the gathered shapes are identical;
    a full-tensor gather would double) — and no all_to_all resharding."""
    from functools import partial

    from cnn_pde_tpu.parallel import adi_strang_step_partitioned
    from cnn_pde_tpu.parallel.hlo_audit import (collective_counts,
                                                compile_text,
                                                gather_result_shapes)

    mesh = make_mesh(data=1, spatial=8)
    shapes_by_h = {}
    for H in (48, 96):
        u = jnp.asarray(rng.standard_normal((4, H, 48)).astype(np.float32))
        a = jnp.asarray(rng.random((H, 48)).astype(np.float32) + 0.2)
        txt = compile_text(partial(adi_strang_step_partitioned, mesh,
                                   dt=0.01), u, a, a)
        c = collective_counts(txt)
        assert c["all-gather"] == 2, (H, c)
        assert c["all-to-all"] == c["collective-permute"] == 0, (H, c)
        shapes_by_h[H] = sorted(gather_result_shapes(txt))
    assert shapes_by_h[48] == shapes_by_h[96], shapes_by_h


def test_hlo_dp_step_collective_shape(key):
    """The DP train step's only cross-device traffic is the gradient psum
    family: all-reduces covering every gradient leaf (XLA's combiner may
    merge them), no resharding collectives, and any all-gather is an
    integer index gather (cross-entropy's scatter-add backward), never a
    float tensor (that would mean params/activations crossing devices)."""
    import optax

    from cnn_pde_tpu.parallel.hlo_audit import (collective_counts,
                                                gather_result_shapes)

    model = MNISTClassifier()
    params, state = model.init(key)
    mesh = make_mesh(spatial=1)  # 8-way DP
    opt = optax.adamw(1e-3)
    step = make_dp_train_step(model, opt, mesh, label_smoothing=0.1)

    images = jnp.zeros((16, 1, 28, 28), jnp.float32)
    labels = jnp.zeros((16,), jnp.int32)
    txt = step.lower(
        replicate(mesh, params), replicate(mesh, state),
        replicate(mesh, opt.init(params)),
        *shard_batch(mesh, (images, labels)),
        jax.random.PRNGKey(1)).compile().as_text()

    c = collective_counts(txt)
    n_leaves = len(jax.tree_util.tree_leaves(params))
    assert 1 <= c["all-reduce"] <= n_leaves + 2, (c, n_leaves)
    assert c["all-to-all"] == c["collective-permute"] == 0, c
    float_gathers = [(t, d) for t, d in gather_result_shapes(txt)
                     if t.startswith(("f", "bf"))]
    assert not float_gathers, float_gathers
