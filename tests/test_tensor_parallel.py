"""Tensor parallelism (parallel/tensor_parallel.py): Megatron col/row spec
derivation, numerical equivalence of the TP train step vs single-device,
composition with data parallelism, and the presence of the row-parallel
all-reduce in the compiled program.

Runs on the 8-virtual-CPU mesh (conftest.py). The reference is
single-device; this subsystem is framework-added (SURVEY.md §2.6), so the
tests pin OUR contract."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cnn_pde_tpu.models.cifar10_noconv import CIFAR10PDENoConv, EnhancedFC
from cnn_pde_tpu.nn.core import Ctx
from cnn_pde_tpu.parallel import (P, make_mesh, make_tp_train_step,
                                  replicated_like, shard_pytree,
                                  tp_param_specs)
from cnn_pde_tpu.train.losses import cross_entropy


def _fc_model(dropout=0.0):
    return EnhancedFC(96, [512, 256], 10, dropout_rate=dropout)


def test_tp_specs_megatron_alternation(key):
    """Chain walker: Linear col → BN sharded → Linear row → BN replicated →
    small final Linear replicated."""
    model = _fc_model()
    params, _ = model.init(key)
    mesh = make_mesh(data=2, model=4)
    specs = tp_param_specs(params, mesh)
    assert specs["0"]["w"] == P(None, "model")   # 96→512 column-parallel
    assert specs["0"]["b"] == P("model")
    assert specs["1"]["scale"] == P("model")     # BN rides the sharded feats
    assert specs["1"]["bias"] == P("model")
    assert specs["4"]["w"] == P("model", None)   # 512→256 row-parallel
    assert specs["4"]["b"] == P()
    assert specs["5"]["scale"] == P()            # activation replicated again
    assert specs["8"]["w"] == P()                # 256→10: too small, stays
    assert specs["8"]["b"] == P()


def test_tp_specs_trivial_axis_is_fully_replicated(key):
    model = _fc_model()
    params, _ = model.init(key)
    mesh = make_mesh(data=8, model=1)
    specs = tp_param_specs(params, mesh)
    assert all(s == P() for s in jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, type(P()))))


def test_tp_step_matches_single_device(key):  # quick tier: see conftest.py
    """3 TP train steps on a data=2 × model=4 mesh must reproduce the
    single-device trajectory (loss + params) to f32 reduction-order
    tolerance — the psum/all-reduce only changes summation order.

    The optimizer is SGD+momentum on purpose: it is Lipschitz in the
    gradients, so reduction-order noise stays O(noise).  Adam is NOT usable
    for a trajectory-equivalence test — its first step is ±lr·sign(g), so
    any near-zero gradient element (e.g. a Linear bias feeding a BatchNorm,
    whose grad is exactly the rounding residue of the mean-subtraction)
    diverges by 2·lr when the summation order flips its sign."""
    model = _fc_model(dropout=0.0)
    params, mstate = model.init(key)
    opt = optax.sgd(1e-2, momentum=0.9)
    kx, kl, ks = jax.random.split(jax.random.PRNGKey(1), 3)
    images = jax.random.normal(kx, (16, 96), jnp.float32)
    labels = jax.random.randint(kl, (16,), 0, 10)

    # single-device reference trajectory
    def step(p, ms, os_, x, y, rng):
        def loss_fn(pp):
            logits, new_ms = model.apply(pp, ms, x, Ctx(train=True, rng=rng))
            return cross_entropy(logits, y, 0.1), new_ms
        (l, new_ms), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        upd, new_os = opt.update(g, os_, p)
        return optax.apply_updates(p, upd), new_ms, new_os, l

    ref_step = jax.jit(step)
    p1, ms1, os1 = params, mstate, opt.init(params)
    ref_losses = []
    for i in range(3):
        p1, ms1, os1, l = ref_step(p1, ms1, os1, images, labels,
                                   jax.random.fold_in(ks, i))
        ref_losses.append(float(l))

    # TP trajectory
    mesh = make_mesh(data=2, model=4)
    specs = tp_param_specs(params, mesh)
    p2 = shard_pytree(mesh, params, specs)
    ms2 = replicated_like(mesh, mstate)
    os2 = jax.jit(opt.init)(p2)
    tp_step = make_tp_train_step(model, opt, mesh, label_smoothing=0.1)
    tp_losses = []
    for i in range(3):
        p2, ms2, os2, l = tp_step(p2, ms2, os2, images, labels,
                                  jax.random.fold_in(ks, i))
        tp_losses.append(float(l))

    np.testing.assert_allclose(tp_losses, ref_losses, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_tp_grads_match_single_device(key):
    """The raw gradients under TP sharding equal the single-device gradients
    to summation-order tolerance — the direct statement that column/row
    sharding + the one psum computes the same math."""
    model = _fc_model(dropout=0.0)
    params, mstate = model.init(key)
    kx, kl = jax.random.split(jax.random.PRNGKey(7))
    images = jax.random.normal(kx, (16, 96), jnp.float32)
    labels = jax.random.randint(kl, (16,), 0, 10)

    def grads(p):
        def loss_fn(pp):
            logits, _ = model.apply(pp, mstate, images, Ctx(train=False))
            return cross_entropy(logits, labels, 0.1)
        return jax.grad(loss_fn)(p)

    g1 = jax.jit(grads)(params)
    mesh = make_mesh(data=2, model=4)
    p2 = shard_pytree(mesh, params, tp_param_specs(params, mesh))
    g2 = jax.jit(grads)(p2)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_tp_weights_are_actually_distributed(key):
    """The sharded Linear's per-device shard must be 1/tp of the weight."""
    model = _fc_model()
    params, _ = model.init(key)
    mesh = make_mesh(data=2, model=4)
    p = shard_pytree(mesh, params, tp_param_specs(params, mesh))
    w = p["0"]["w"]                       # (96, 512) col-parallel over 4
    shard_shapes = {s.data.shape for s in w.addressable_shards}
    assert shard_shapes == {(96, 128)}
    w_row = p["4"]["w"]                   # (512, 256) row-parallel over 4
    assert {s.data.shape for s in w_row.addressable_shards} == {(128, 256)}


def test_tp_row_parallel_compiles_to_allreduce(key):
    """The row-parallel matmul must lower to an XLA all-reduce (the one
    Megatron psum), not to a gather of the full activation."""
    model = _fc_model()
    params, mstate = model.init(key)
    mesh = make_mesh(data=1, model=8)
    p = shard_pytree(mesh, params, tp_param_specs(params, mesh))

    def fwd(pp, x):
        y, _ = model.apply(pp, mstate, x, Ctx(train=False))
        return y

    x = jnp.ones((4, 96), jnp.float32)
    txt = jax.jit(fwd).lower(p, x).compile().as_text()
    assert "all-reduce" in txt


def test_tp_dp_flagship_train_step(key):
    """Composition: the flagship CIFAR10PDENoConv trains one step under
    DP×TP (data=2, model=4) with finite loss and params staying sharded."""
    model = CIFAR10PDENoConv(dropout_rate=0.0)
    params, mstate = model.init(key)
    mesh = make_mesh(data=2, model=4)
    specs = tp_param_specs(params, mesh)
    # the wide FC stack sharded, PDE coefficients replicated
    cl = specs["classifier"]
    assert cl["0"]["w"] == P(None, "model")
    assert cl["4"]["w"] == P("model", None)
    assert all(
        s == P() for s in jax.tree_util.tree_leaves(
            specs["feature_extractor"],
            is_leaf=lambda x: isinstance(x, type(P()))))
    p = shard_pytree(mesh, params, specs)
    ms = replicated_like(mesh, mstate)
    opt = optax.adamw(1e-3)
    os_ = jax.jit(opt.init)(p)
    step = make_tp_train_step(model, opt, mesh)
    kx, kl = jax.random.split(jax.random.PRNGKey(3))
    images = jax.random.normal(kx, (16, 3, 32, 32), jnp.float32)
    labels = jax.random.randint(kl, (16,), 0, 10)
    p, ms, os_, loss = step(p, ms, os_, images, labels, jax.random.PRNGKey(4))
    assert np.isfinite(float(loss))
    # update preserved the committed TP layout
    assert {s.data.shape for s in
            p["classifier"]["0"]["w"].addressable_shards} == {(96, 128)}


def test_trainer_tp_matches_single_device(key):
    """Trainer(mesh=, tp=True): one device-epoch on MNIST under DP x TP must
    track the single-device trainer (same seed/shuffle/rng streams) — loss
    to reduction-order noise, params loosely (AdamW amplifies noise on
    low-gradient params), and the TP layout must actually be committed."""
    from cnn_pde_tpu.data import load_dataset
    from cnn_pde_tpu.models import MNISTClassifier
    from cnn_pde_tpu.train import TrainConfig, Trainer

    ds = load_dataset("mnist", "/nonexistent", synthetic_ok=True,
                      synthetic_train_per_class=10, synthetic_test_per_class=2)
    model = MNISTClassifier(dropout_rate=0.0)

    def run(mesh, tp):
        cfg = TrainConfig(epochs=1, batch_size=16, log_every=10**9,
                          device_epoch=True)
        trainer = Trainer(model, cfg, lambda s: 1e-3, mesh=mesh, tp=tp)
        state = trainer.init_state(key, None)
        stats = trainer.train_epoch(state, ds, 0, verbose=False)
        ev = trainer.evaluate(state, ds)
        return state, stats, ev

    s_ref, h_ref, ev_ref = run(None, False)
    mesh = make_mesh(data=2, model=4)
    s_tp, h_tp, ev_tp = run(mesh, True)
    assert s_ref.step == s_tp.step == 6
    assert abs(h_ref["loss"] - h_tp["loss"]) < 1e-3
    # the wide Linear really is column-sharded over the 4-way 'model' axis
    w = s_tp.params["head"]["2"]["w"]  # (784, 256)
    assert {s.data.shape for s in w.addressable_shards} == {(784, 64)}
    # the Trainer surface is AdamW-only (reference parity), so this cannot
    # use the SGD trajectory rule (CLAUDE.md): Adam steps are ~±lr·sign(g),
    # and reduction-order noise on a near-zero-gradient leaf can flip a
    # sign for ±2·lr = 2e-3 of divergence per step — tolerance sized to
    # absorb one flip rather than flake on it
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2.5e-3)
    assert abs(ev_ref["acc"] - ev_tp["acc"]) <= 5.0 + 1e-9


def test_tp_serving_matches_replicated(key):
    """serve.make_predict_fn with TP-committed params (closure constants
    keep their committed shardings) must reproduce the replicated-params
    predictions — TP serving needs no serve.py changes, just shard_pytree
    before building the predict fn."""
    from cnn_pde_tpu.serve import make_predict_fn

    model = _fc_model()
    params, mstate = model.init(key)
    x = jnp.asarray(np.random.default_rng(11).random((16, 96), np.float32))
    ref = make_predict_fn(model, params, mstate)(x)

    mesh = make_mesh(data=2, model=4)
    p = shard_pytree(mesh, params, tp_param_specs(params, mesh))
    out = make_predict_fn(model, p, mstate, mesh=mesh)(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# SymmetricLayer tensor parallelism (VERDICT r4 #3): the hybrid model's
# 3072² K — the repo's largest single weight and SURVEY §2.6-4's named TP
# case — sharded col-parallel with the one row-parallel psum where the
# design says it must land.

def _parabolic_model(num_steps=2, spatial=8):
    """Small SymmetricLayer-bearing classifier: ParabolicBlock (D = 3·8² =
    192, divisible by the 4- and 8-way 'model' axes) + flatten + head."""
    from cnn_pde_tpu.nn.core import Module
    from cnn_pde_tpu.nn.layers import Linear
    from cnn_pde_tpu.pde import ParabolicBlock

    class ParabolicNet(Module):
        def __init__(self):
            self.block = ParabolicBlock(3, spatial, num_steps=num_steps,
                                        dt=0.5)
            self.head = Linear(3 * spatial * spatial, 10)

        def init(self, key):
            k1, k2 = jax.random.split(key)
            pb, sb = self.block.init(k1)
            ph, _ = self.head.init(k2)
            return {"block": pb, "head": ph}, {"block": sb}

        def apply(self, params, state, x, ctx):
            y, sb = self.block.apply(params["block"], state["block"], x, ctx)
            logits, _ = self.head.apply(params["head"], {},
                                        y.reshape(y.shape[0], -1), ctx)
            return logits, {"block": sb}

    return ParabolicNet()


def test_symmetric_tp_specs_hybrid_model(key):
    """The full CIFAR10HybridPDEModel: all three SymmetricLayers' K shard
    col-parallel over 'model' with BN riding the shard; the head chain keeps
    its Megatron alternation; diffusion coefficient fields stay replicated."""
    from cnn_pde_tpu.models.cifar10_hybrid import CIFAR10HybridPDEModel

    model = CIFAR10HybridPDEModel(dropout_rate=0.0)
    params, _ = model.init(key)
    mesh = make_mesh(data=2, model=4)
    specs = tp_param_specs(params, mesh)
    fe = specs["feature_extractor"]
    for sym in (fe["parabolic"]["sym"], fe["hamiltonian"]["F_Y"],
                fe["hamiltonian"]["F_Z"]):
        assert sym["K"]["w"] == P(None, "model")
        assert sym["norm"]["scale"] == P("model")
        assert sym["norm"]["bias"] == P("model")
    for name in ("diffusion1", "diffusion2"):
        assert all(s == P() for s in jax.tree_util.tree_leaves(
            fe[name], is_leaf=lambda x: isinstance(x, type(P()))))
    cl = specs["classifier"]
    assert cl["0"]["w"] == P(None, "model")      # 384→1024 column
    assert cl["4"]["w"] == P("model", None)      # 1024→512 row


def test_symmetric_tp_weights_are_distributed(key):
    model = _parabolic_model()
    params, _ = model.init(key)
    mesh = make_mesh(data=2, model=4)
    p = shard_pytree(mesh, params, tp_param_specs(params, mesh))
    w = p["block"]["sym"]["K"]["w"]              # (192, 192) col over 4
    assert {s.data.shape for s in w.addressable_shards} == {(192, 48)}
    scale = p["block"]["sym"]["norm"]["scale"]
    assert {s.data.shape for s in scale.addressable_shards} == {(48,)}


def test_symmetric_tp_grads_match_single_device(key):
    """Gradients (incl. into the doubly-applied K) under the SymmetricLayer
    sharding equal single-device to summation-order tolerance."""
    model = _parabolic_model()
    params, mstate = model.init(key)
    kx, kl = jax.random.split(jax.random.PRNGKey(5))
    images = jax.random.normal(kx, (16, 3, 8, 8), jnp.float32)
    labels = jax.random.randint(kl, (16,), 0, 10)

    def grads(p):
        def loss_fn(pp):
            logits, _ = model.apply(pp, mstate, images, Ctx(train=False))
            return cross_entropy(logits, labels, 0.1)
        return jax.grad(loss_fn)(p)

    g1 = jax.jit(grads)(params)
    mesh = make_mesh(data=2, model=4)
    p2 = shard_pytree(mesh, params, tp_param_specs(params, mesh))
    g2 = jax.jit(grads)(p2)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_symmetric_tp_trajectory_sgd_matches_single_device(key):
    """3 SGD train steps under DP×TP reproduce the single-device trajectory
    (SGD per the mesh invariant — Adam's sign-step amplifies reduction-order
    noise on zero-gradient params, CLAUDE.md)."""
    model = _parabolic_model()
    params, mstate = model.init(key)
    opt = optax.sgd(1e-2, momentum=0.9)
    kx, kl, ks = jax.random.split(jax.random.PRNGKey(9), 3)
    images = jax.random.normal(kx, (16, 3, 8, 8), jnp.float32)
    labels = jax.random.randint(kl, (16,), 0, 10)

    def step(p, ms, os_, x, y, rng):
        def loss_fn(pp):
            logits, new_ms = model.apply(pp, ms, x, Ctx(train=True, rng=rng))
            return cross_entropy(logits, y, 0.1), new_ms
        (l, new_ms), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        upd, new_os = opt.update(g, os_, p)
        return optax.apply_updates(p, upd), new_ms, new_os, l

    ref_step = jax.jit(step)
    p1, ms1, os1 = params, mstate, opt.init(params)
    ref_losses = []
    for i in range(3):
        p1, ms1, os1, l = ref_step(p1, ms1, os1, images, labels,
                                   jax.random.fold_in(ks, i))
        ref_losses.append(float(l))

    mesh = make_mesh(data=2, model=4)
    p2 = shard_pytree(mesh, params, tp_param_specs(params, mesh))
    ms2 = replicated_like(mesh, mstate)
    os2 = jax.jit(opt.init)(p2)
    tp_step = make_tp_train_step(model, opt, mesh, label_smoothing=0.1)
    tp_losses = []
    for i in range(3):
        p2, ms2, os2, l = tp_step(p2, ms2, os2, images, labels,
                                  jax.random.fold_in(ks, i))
        tp_losses.append(float(l))
    np.testing.assert_allclose(tp_losses, ref_losses, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_symmetric_hlo_one_allreduce_per_step(key):
    """Communication shape (hlo_audit discipline): a ParabolicBlock forward
    with num_steps=N on a model-only mesh compiles to EXACTLY N all-reduces
    — one row-parallel psum per F_sym evaluation, after the second matmul
    (σ(BN(Y·w))·wᵀ contracts over the sharded feature axis) — and no
    all-to-alls; the hidden activations never materialize unsharded."""
    from cnn_pde_tpu.parallel.hlo_audit import collective_counts
    from cnn_pde_tpu.pde import ParabolicBlock

    for n_steps in (1, 3):
        block = ParabolicBlock(3, 8, num_steps=n_steps, dt=0.5)
        params, mstate = block.init(key)
        mesh = make_mesh(data=1, model=8)
        p = shard_pytree(mesh, params, tp_param_specs(params, mesh))

        def fwd(pp, x):
            y, _ = block.apply(pp, mstate, x, Ctx(train=False))
            return y

        x = jnp.ones((4, 3, 8, 8), jnp.float32)
        txt = jax.jit(fwd).lower(p, x).compile().as_text()
        counts = collective_counts(txt)
        assert counts["all-reduce"] == n_steps, (n_steps, counts)
        assert counts["all-to-all"] == 0, counts


def test_make_mesh_three_axes_backcompat():
    m = make_mesh(spatial=1)
    assert m.axis_names == ("data", "spatial", "model")
    assert m.shape["data"] == 8 and m.shape["model"] == 1
    m2 = make_mesh(data=2, spatial=2, model=2)
    assert m2.devices.size == 8
