"""Activation parity against the ACTUAL reference implementation.

These tests import the reference scripts from /root/reference (read-only
mount), instantiate their PDE layers, copy identical weights into our layers,
and compare forward activations on identical inputs — the ≤1e-5 activation
parity requirement checked against the real thing rather than our oracle.

Skipped automatically when the reference mount is absent (e.g. on CI/judge
machines); the float64 golden-oracle tests in test_pde_layers.py remain the
portable parity suite.
"""

import importlib.util
import os
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference mount absent")

torch = pytest.importorskip("torch")

TOL = dict(rtol=1e-5, atol=1e-5)


def _load_ref(name):
    """Import a reference script, stubbing ONLY genuinely-missing modules
    (they're only used for data/plots, not the layers).  Modules that exist
    for real must not be shadowed — other tests import them."""
    for mod in ("torchvision", "matplotlib", "matplotlib.pyplot", "kagglehub",
                "seaborn", "sklearn", "sklearn.metrics", "pandas"):
        if mod in sys.modules:
            continue
        try:
            importlib.import_module(mod)
            continue  # real module available — leave it alone
        except ImportError:
            pass
        m = types.ModuleType(mod)
        if mod == "torchvision":
            m.datasets = types.ModuleType("d")
            m.transforms = types.ModuleType("t")
        if mod == "matplotlib":
            m.pyplot = types.ModuleType("p")
        if mod == "sklearn":
            m.metrics = types.ModuleType("m")
        if mod == "sklearn.metrics":
            m.classification_report = lambda *a, **k: ""
            m.confusion_matrix = lambda *a, **k: None
        sys.modules[mod] = m
    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", os.path.join(REF, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    import contextlib
    import io

    with contextlib.redirect_stdout(io.StringIO()):
        spec.loader.exec_module(mod)
    return mod


def test_mnist_diffusion_layer_parity(rng, key):
    ref = _load_ref("mnist_test")
    from cnn_pde_tpu.pde import GrayscaleDiffusion

    ours = GrayscaleDiffusion(size=28, dt=0.001, dx=1.0, dy=1.0, num_steps=10,
                              init_value=2.0)
    params, state = ours.init(key)
    params["alpha_base"] = params["alpha_base"] + jnp.asarray(
        rng.standard_normal((28, 28)).astype(np.float32) * 0.3)
    params["alpha_time_coeff"] = jnp.asarray(
        rng.standard_normal((28, 28)).astype(np.float32) * 0.05)
    params["beta_time_coeff"] = jnp.asarray(
        rng.standard_normal((28, 28)).astype(np.float32) * 0.05)

    import contextlib
    import io

    with contextlib.redirect_stdout(io.StringIO()):
        layer = ref.DiffusionLayer(size=28, dt=0.001, dx=1.0, dy=1.0,
                                   num_steps=10)
    with torch.no_grad():
        layer.alpha_base.copy_(torch.from_numpy(np.asarray(params["alpha_base"])))
        layer.beta_base.copy_(torch.from_numpy(np.asarray(params["beta_base"])))
        layer.alpha_time_coeff.copy_(
            torch.from_numpy(np.asarray(params["alpha_time_coeff"])))
        layer.beta_time_coeff.copy_(
            torch.from_numpy(np.asarray(params["beta_time_coeff"])))

    u = rng.random((2, 1, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref_out = layer(torch.from_numpy(u)).numpy()
    out, _ = ours(params, state, jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(out), ref_out, **TOL)


def test_svhn_diffusion_layer_parity(rng, key):
    ref = _load_ref("SVHN")
    from cnn_pde_tpu.pde import ChannelCoupledDiffusion

    ours = ChannelCoupledDiffusion(size=32, channels=3, dt=0.01, num_steps=10)
    params, state = ours.init(key)

    layer = ref.DiffusionLayer(size=32, channels=3)
    with torch.no_grad():
        for name, mine in [("alpha_base", "alpha_base"),
                           ("beta_base", "beta_base"),
                           ("alpha_time_coeff", "alpha_time_coeff"),
                           ("beta_time_coeff", "beta_time_coeff"),
                           ("channel_coupling", "channel_coupling"),
                           ("skip_weight", "skip_weight")]:
            getattr(layer, name).copy_(
                torch.from_numpy(np.asarray(params[mine])))

    u = rng.random((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref_out = layer(torch.from_numpy(u)).numpy()
    out, _ = ours(params, state, jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(out), ref_out, **TOL)


@pytest.mark.parametrize("which,splitting", [("cifar10", "strang"),
                                             ("cifar_2version", "lie")])
def test_cifar_diffusion_layer_parity(rng, key, which, splitting):
    ref = _load_ref(which)
    from cnn_pde_tpu.pde import MixedChannelDiffusion

    ours = MixedChannelDiffusion(size=32, channels=3, dt=0.002, num_steps=5,
                                 splitting=splitting)
    params, state = ours.init(key)
    params["alpha_time_coeff"] = jnp.asarray(
        rng.standard_normal((3, 32, 32)).astype(np.float32) * 0.1)

    import contextlib
    import io

    cls = (ref.EnhancedDiffusionLayer if which == "cifar10"
           else ref.LearnableDiffusionLayer)
    with contextlib.redirect_stdout(io.StringIO()):
        layer = cls(size=32, channels=3, dt=0.002, num_steps=5)
    with torch.no_grad():
        layer.alpha_base.copy_(torch.from_numpy(np.asarray(params["alpha_base"])))
        layer.beta_base.copy_(torch.from_numpy(np.asarray(params["beta_base"])))
        layer.alpha_time_coeff.copy_(
            torch.from_numpy(np.asarray(params["alpha_time_coeff"])))
        layer.beta_time_coeff.copy_(
            torch.from_numpy(np.asarray(params["beta_time_coeff"])))
        layer.channel_mixing.copy_(
            torch.from_numpy(np.asarray(params["channel_mixing"])))

    u = rng.random((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref_out = layer(torch.from_numpy(u)).numpy()
    out, _ = ours(params, state, jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(out), ref_out, **TOL)


def test_emotion_pde_layer_parity(rng, key):
    ref = _load_ref("emotion_recognition")
    from cnn_pde_tpu.pde import FourierFTCSLayer

    ours = FourierFTCSLayer(Nx=48, Ny=48)
    params, state = ours.init(key)

    layer = ref.PDELayer(Nx=48, Ny=48)
    with torch.no_grad():
        for name in ("alpha_w1", "alpha_w2", "alpha_w3",
                     "beta_w1", "beta_w2", "beta_w3"):
            getattr(layer, name).copy_(
                torch.tensor(float(np.asarray(params[name]))))

    u = rng.random((2, 1, 48, 48)).astype(np.float32)
    with torch.no_grad():
        ref_out = layer(torch.from_numpy(u)).numpy()
    out, _ = ours(params, state, jnp.asarray(u))
    # The layer is CFL-unstable at init (values amplify ~1e6 over 10 steps) —
    # relative comparison (see test_pde_layers.py)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=5e-4, atol=1e-5)


def test_tiny_imagenet_diffusion_parity(rng, key):
    ref = _load_ref("tiny_imagenet")
    from cnn_pde_tpu.pde import ResidualDiffusion

    ours = ResidualDiffusion(size=64, channels=3, dt=0.01, num_steps=1)
    params, state = ours.init(key)
    params["channel_scaling"] = jnp.asarray([1.1, 0.9, 1.05], jnp.float32)

    layer = ref.ImprovedDiffusionLayer(size=64, channels=3, num_steps=1,
                                       use_implicit=False)
    with torch.no_grad():
        layer.alpha_base.copy_(torch.from_numpy(np.asarray(params["alpha_base"])))
        layer.beta_base.copy_(torch.from_numpy(np.asarray(params["beta_base"])))
        layer.channel_scaling.copy_(
            torch.from_numpy(np.asarray(params["channel_scaling"])))

    u = rng.random((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out = layer(torch.from_numpy(u)).numpy()
    out, _ = ours(params, state, jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-5, atol=2e-5)


def _copy_sym_weights(ref_sym, params, state):
    """Copy a reference SymmetricLayer's torch weights into our param/state
    pytrees (our Linear kernel is (in, out) = K.weightᵀ).

    The .copy() calls are load-bearing: .detach().numpy() returns a VIEW of
    the torch buffer, and jnp.asarray on CPU zero-copies aligned numpy
    arrays — without the copy, torch's subsequent IN-PLACE running-stat
    updates would mutate \"our\" state too."""
    params["K"]["w"] = jnp.asarray(
        ref_sym.K.weight.detach().numpy().T.copy())
    params["norm"]["scale"] = jnp.asarray(
        ref_sym.norm.weight.detach().numpy().copy())
    params["norm"]["bias"] = jnp.asarray(
        ref_sym.norm.bias.detach().numpy().copy())
    state["norm"]["mean"] = jnp.asarray(
        ref_sym.norm.running_mean.detach().numpy().copy())
    state["norm"]["var"] = jnp.asarray(
        ref_sym.norm.running_var.detach().numpy().copy())
    return params, state


@pytest.mark.parametrize("train", [True, False])
def test_ruthotto_blocks_parity(rng, key, train):
    """P6-P8 (SymmetricLayer / ParabolicBlock / HamiltonianBlock) forward
    activations vs the actual cifar_2version.py implementations, in both
    BN modes, with identical weights (compute_dtype=f32 for the exact
    comparison; the default-bf16 layer is bounded separately in
    test_pde_layers.py)."""
    ref = _load_ref("cifar_2version")
    from cnn_pde_tpu.pde import HamiltonianBlock, ParabolicBlock
    from cnn_pde_tpu.pde.ruthotto import SymmetricLayer

    C, S, B = 2, 4, 8
    Y_np = rng.standard_normal((B, C, S, S)).astype(np.float32)
    Yt = torch.from_numpy(Y_np)
    Yj = jnp.asarray(Y_np)

    # --- SymmetricLayer (P6) ---
    torch.manual_seed(0)
    ref_sym = ref.SymmetricLayer(C, S)
    ref_sym.train(train)
    ours = SymmetricLayer(C, S, compute_dtype=jnp.float32)
    params, state = ours.init(key)
    # copy BEFORE running the reference (its train-mode forward mutates the
    # BN running stats)
    params, state = _copy_sym_weights(ref_sym, params, state)
    with torch.no_grad():
        out_ref = ref_sym(Yt).numpy()
    out, _ = ours(params, state, Yj, train=train)
    np.testing.assert_allclose(np.asarray(out), out_ref, **TOL)

    # --- ParabolicBlock (P7): 4 Euler steps through the same BN ---
    torch.manual_seed(1)
    ref_pb = ref.ParabolicBlock(C, S, num_steps=4, dt=0.5)
    ref_pb.train(train)
    pb = ParabolicBlock(C, S, num_steps=4, dt=0.5,
                        compute_dtype=jnp.float32)
    params, state = pb.init(key)
    params["sym"], state["sym"] = _copy_sym_weights(
        ref_pb.symmetric_layer, params["sym"], state["sym"])
    with torch.no_grad():
        out_ref = ref_pb(Yt).numpy()
    out, new_state = pb(params, state, Yj, train=train)
    np.testing.assert_allclose(np.asarray(out), out_ref, **TOL)
    if train:  # running stats accumulate across the 4 BN calls identically
        np.testing.assert_allclose(
            np.asarray(new_state["sym"]["norm"]["mean"]),
            ref_pb.symmetric_layer.norm.running_mean.detach().numpy(),
            **TOL)

    # --- HamiltonianBlock (P8): Verlet two-field integration ---
    torch.manual_seed(2)
    ref_hb = ref.HamiltonianBlock(C, S, num_steps=3, dt=0.8)
    ref_hb.train(train)
    hb = HamiltonianBlock(C, S, num_steps=3, dt=0.8,
                          compute_dtype=jnp.float32)
    params, state = hb.init(key)
    params["F_Y"], state["F_Y"] = _copy_sym_weights(
        ref_hb.F_Y, params["F_Y"], state["F_Y"])
    params["F_Z"], state["F_Z"] = _copy_sym_weights(
        ref_hb.F_Z, params["F_Z"], state["F_Z"])
    with torch.no_grad():
        out_ref = ref_hb(Yt).numpy()
    out, _ = hb(params, state, Yj, train=train)
    np.testing.assert_allclose(np.asarray(out), out_ref, **TOL)


def test_mnist_full_model_logits_parity(rng, key):
    """END-TO-END M1 parity: the whole PDEClassifier (diffusion + MLP head)
    vs the actual mnist_test.py model with identical weights — eval mode
    (dropout off), logits at ≤1e-5."""
    ref = _load_ref("mnist_test")
    from cnn_pde_tpu.models import MNISTClassifier

    torch.manual_seed(0)
    ref_model = ref.PDEClassifier(dropout_rate=0.1, dx=1.0, dy=1.0)
    ref_model.eval()
    # perturb the coefficient fields so the PDE path is non-trivial
    with torch.no_grad():
        ref_model.diff.alpha_base += torch.from_numpy(
            rng.standard_normal((28, 28)).astype(np.float32) * 0.3)
        ref_model.diff.alpha_time_coeff.copy_(torch.from_numpy(
            rng.standard_normal((28, 28)).astype(np.float32) * 0.05))

    ours = MNISTClassifier()
    params, state = ours.init(key)
    d = ref_model.diff
    params["diff"] = {
        "alpha_base": jnp.asarray(d.alpha_base.detach().numpy().copy()),
        "beta_base": jnp.asarray(d.beta_base.detach().numpy().copy()),
        "alpha_time_coeff": jnp.asarray(
            d.alpha_time_coeff.detach().numpy().copy()),
        "beta_time_coeff": jnp.asarray(
            d.beta_time_coeff.detach().numpy().copy()),
    }
    # head: Sequential[Flatten, Dropout, Linear, ReLU, Dropout, Linear] —
    # Linear layers sit at indices 2 and 5; our kernel is torch weightᵀ
    params["head"]["2"] = {
        "w": jnp.asarray(ref_model.fc1.weight.detach().numpy().T.copy()),
        "b": jnp.asarray(ref_model.fc1.bias.detach().numpy().copy())}
    params["head"]["5"] = {
        "w": jnp.asarray(ref_model.fc2.weight.detach().numpy().T.copy()),
        "b": jnp.asarray(ref_model.fc2.bias.detach().numpy().copy())}

    x = rng.standard_normal((4, 1, 28, 28)).astype(np.float32)
    with torch.no_grad():
        logits_ref = ref_model(torch.from_numpy(x)).numpy()
    logits, _ = ours(params, state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(logits), logits_ref, **TOL)


@pytest.mark.parametrize("train", [True, False])
def test_fashion_full_model_logits_parity(rng, key, train):
    """END-TO-END M2 parity: the Fashion PDEClassifier (diffusion + BN MLP
    head) vs the actual fashion_mnist.py model with identical weights — BN
    batch-stat (train) and running-stat (eval) modes, dropout disabled by
    rate-0 construction so train mode is deterministic."""
    ref = _load_ref("fashion_mnist")
    from cnn_pde_tpu.models import FashionClassifier

    torch.manual_seed(0)
    ref_model = ref.FashionPDEClassifier(dropout_rate=0.0)
    ref_model.train(train)
    with torch.no_grad():
        ref_model.diff.alpha_base += torch.from_numpy(
            rng.standard_normal((28, 28)).astype(np.float32) * 0.2)
        # nontrivial BN running stats for the eval comparison
        ref_model.bn1.running_mean.copy_(torch.from_numpy(
            rng.standard_normal(512).astype(np.float32) * 0.1))
        ref_model.bn2.running_var.copy_(torch.from_numpy(
            (1.0 + rng.random(256) * 0.3).astype(np.float32)))

    ours = FashionClassifier(dropout_rate=0.0)
    params, state = ours.init(key)
    d = ref_model.diff
    params["diff"] = {
        k: jnp.asarray(getattr(d, k).detach().numpy().copy())
        for k in ("alpha_base", "beta_base",
                  "alpha_time_coeff", "beta_time_coeff")}
    # head: [Flatten, Linear, BN, ReLU, Dropout, Linear, BN, ReLU, Dropout,
    #        Linear] — Linear at 1/5/9, BN at 2/6
    for idx, lin in (("1", ref_model.fc1), ("5", ref_model.fc2),
                     ("9", ref_model.fc3)):
        params["head"][idx] = {
            "w": jnp.asarray(lin.weight.detach().numpy().T.copy()),
            "b": jnp.asarray(lin.bias.detach().numpy().copy())}
    for idx, bn in (("2", ref_model.bn1), ("6", ref_model.bn2)):
        params["head"][idx] = {
            "scale": jnp.asarray(bn.weight.detach().numpy().copy()),
            "bias": jnp.asarray(bn.bias.detach().numpy().copy())}
        state["head"][idx] = {
            "mean": jnp.asarray(bn.running_mean.detach().numpy().copy()),
            "var": jnp.asarray(bn.running_var.detach().numpy().copy())}

    x = rng.standard_normal((6, 1, 28, 28)).astype(np.float32)
    with torch.no_grad():
        logits_ref = ref_model(torch.from_numpy(x)).numpy()
    logits, new_state = ours(params, state, jnp.asarray(x), train=train)
    np.testing.assert_allclose(np.asarray(logits), logits_ref,
                               rtol=1e-4, atol=1e-4)
    if train:  # BN running stats must update identically
        np.testing.assert_allclose(
            np.asarray(new_state["head"]["2"]["mean"]),
            ref_model.bn1.running_mean.detach().numpy(), rtol=1e-4, atol=1e-5)


def _copy_mlp_head(params, state, torch_pairs):
    """Copy (Linear, BN) torch modules into our Sequential head params/state
    for the [Flatten, (Linear, BN, ReLU, Dropout)*k, Linear] layout: block i
    has Linear at 1+4i and BN at 2+4i; the final Linear sits at 1+4k."""
    k = len(torch_pairs) - 1  # last entry: (final_linear, None)
    for i, (lin, bn) in enumerate(torch_pairs):
        idx = str(1 + 4 * i)
        params["head"][idx] = {
            "w": jnp.asarray(lin.weight.detach().numpy().T.copy()),
            "b": jnp.asarray(lin.bias.detach().numpy().copy())}
        if bn is not None:
            bidx = str(2 + 4 * i)
            params["head"][bidx] = {
                "scale": jnp.asarray(bn.weight.detach().numpy().copy()),
                "bias": jnp.asarray(bn.bias.detach().numpy().copy())}
            state["head"][bidx] = {
                "mean": jnp.asarray(bn.running_mean.detach().numpy().copy()),
                "var": jnp.asarray(bn.running_var.detach().numpy().copy())}
    return params, state


@pytest.mark.parametrize("train", [True, False])
def test_svhn_full_model_logits_parity(rng, key, train):
    """END-TO-END M3 parity: the SVHN PDEClassifier (channel-coupled
    diffusion + 4-block BN MLP) vs the actual SVHN.py model."""
    ref = _load_ref("SVHN")
    from cnn_pde_tpu.models import SVHNClassifier

    torch.manual_seed(0)
    ref_model = ref.PDEClassifier(dropout_rate=0.0)
    ref_model.train(train)
    ours = SVHNClassifier(dropout_rate=0.0)
    params, state = ours.init(key)
    d = ref_model.diff
    params["diff"] = {
        k: jnp.asarray(getattr(d, k).detach().numpy().copy())
        for k in ("alpha_base", "beta_base", "alpha_time_coeff",
                  "beta_time_coeff", "channel_coupling", "skip_weight")}
    params, state = _copy_mlp_head(
        params, state,
        [(ref_model.fc1, ref_model.bn1), (ref_model.fc2, ref_model.bn2),
         (ref_model.fc3, ref_model.bn3), (ref_model.fc4, ref_model.bn4),
         (ref_model.fc5, None)])

    x = rng.standard_normal((6, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        logits_ref = ref_model(torch.from_numpy(x)).numpy()
    logits, _ = ours(params, state, jnp.asarray(x), train=train)
    np.testing.assert_allclose(np.asarray(logits), logits_ref,
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("train", [True, False])
def test_emotion_full_model_logits_parity(rng, key, train):
    """END-TO-END M12 parity: the emotion DiffusionClassifier (Fourier-FTCS
    PDE + 3-block BN MLP) vs the actual emotion_recognition.py model.  The
    Fourier weights are scaled down so the (reference-unstable-at-init)
    FTCS evolution stays bounded and the ≤1e-4 comparison is meaningful."""
    ref = _load_ref("emotion_recognition")
    from cnn_pde_tpu.models import EmotionClassifier

    torch.manual_seed(0)
    ref_model = ref.DiffusionClassifier(img_size=48, num_classes=7,
                                        dropout_rate=0.0)
    ref_model.train(train)
    ours = EmotionClassifier(dropout_rate=0.0)
    params, state = ours.init(key)
    small = {"alpha_w1": 0.02, "alpha_w2": 0.01, "alpha_w3": 0.005,
             "beta_w1": 0.03, "beta_w2": 0.01, "beta_w3": 0.005}
    with torch.no_grad():
        for name, v in small.items():
            getattr(ref_model.pde, name).copy_(torch.tensor(v))
            params["diff"][name] = jnp.asarray(v, jnp.float32)
    seq = ref_model.classifier
    params, state = _copy_mlp_head(
        params, state,
        [(seq[1], seq[2]), (seq[5], seq[6]), (seq[9], seq[10]), (seq[13], None)])

    x = rng.standard_normal((6, 1, 48, 48)).astype(np.float32)
    with torch.no_grad():
        logits_ref = ref_model(torch.from_numpy(x)).numpy()
    logits, _ = ours(params, state, jnp.asarray(x), train=train)
    np.testing.assert_allclose(np.asarray(logits), logits_ref,
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("train", [True, False])
def test_cifar10_flagship_full_model_logits_parity(rng, key, train):
    """END-TO-END M7 parity: the FLAGSHIP CIFAR10PDENoConv (3 multi-scale
    diffusion branches + spatial attentions + softmax combine + BN2d +
    avg‖max pools + EnhancedFC) vs the actual cifar10.py model — every
    weight copied, both BN modes."""
    ref = _load_ref("cifar10")
    from cnn_pde_tpu.models import CIFAR10PDENoConv

    import contextlib
    import io

    torch.manual_seed(0)
    with contextlib.redirect_stdout(io.StringIO()):
        ref_model = ref.CIFAR10PDENoConv(dropout_rate=0.0)
    ref_model.train(train)
    ours = CIFAR10PDENoConv(dropout_rate=0.0)
    params, state = ours.init(key)
    fe, ref_fe = params["feature_extractor"], ref_model.feature_extractor

    for i in (1, 2, 3):
        ref_pde = getattr(ref_fe, f"pde{i}")
        with torch.no_grad():  # nontrivial coefficient fields
            ref_pde.alpha_time_coeff.copy_(torch.from_numpy(
                rng.standard_normal((3, 32, 32)).astype(np.float32) * 0.1))
        fe[f"pde{i}"] = {
            k: jnp.asarray(getattr(ref_pde, k).detach().numpy().copy())
            for k in ("alpha_base", "beta_base", "alpha_time_coeff",
                      "beta_time_coeff", "channel_mixing")}
        ref_att = getattr(ref_fe, f"attention{i}")
        fe[f"attention{i}"]["pos_embed"] = jnp.asarray(
            ref_att.pos_embed.detach().numpy().copy())
        for j in (0, 2):
            lin = ref_att.attention_fc[j]
            fe[f"attention{i}"]["fc"][str(j)] = {
                "w": jnp.asarray(lin.weight.detach().numpy().T.copy()),
                "b": jnp.asarray(lin.bias.detach().numpy().copy())}
    fe["combine_weights"] = jnp.asarray(
        ref_fe.combine_weights.detach().numpy().copy())

    bn = ref_model.feature_bn
    params["feature_bn"] = {
        "scale": jnp.asarray(bn.weight.detach().numpy().copy()),
        "bias": jnp.asarray(bn.bias.detach().numpy().copy())}
    state["feature_bn"] = {
        "mean": jnp.asarray(bn.running_mean.detach().numpy().copy()),
        "var": jnp.asarray(bn.running_var.detach().numpy().copy())}

    # EnhancedFC: [Linear, BN, ReLU, Dropout]×4 + Linear → Linear at
    # 0/4/8/12/16, BN at 1/5/9/13 (same indices both sides)
    net = ref_model.classifier.network
    for idx in (0, 4, 8, 12, 16):
        params["classifier"][str(idx)] = {
            "w": jnp.asarray(net[idx].weight.detach().numpy().T.copy()),
            "b": jnp.asarray(net[idx].bias.detach().numpy().copy())}
    for idx in (1, 5, 9, 13):
        params["classifier"][str(idx)] = {
            "scale": jnp.asarray(net[idx].weight.detach().numpy().copy()),
            "bias": jnp.asarray(net[idx].bias.detach().numpy().copy())}
        state["classifier"][str(idx)] = {
            "mean": jnp.asarray(net[idx].running_mean.detach().numpy().copy()),
            "var": jnp.asarray(net[idx].running_var.detach().numpy().copy())}

    x = rng.standard_normal((6, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        logits_ref = ref_model(torch.from_numpy(x)).numpy()
    logits, _ = ours(params, state, jnp.asarray(x), train=train)
    np.testing.assert_allclose(np.asarray(logits), logits_ref,
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("train", [True, False])
def test_cifar10_hybrid_full_model_logits_parity(rng, key, train):
    """END-TO-END M11 parity: CIFAR10HybridPDEModel (2 Lie diffusions +
    parabolic + Hamiltonian + combine + BN, non-conv attention, BN,
    avg‖max 8×8 pools, 5-block head) vs the actual cifar_2version.py model
    — every weight copied, both BN modes (Ruthotto layers at f32 for the
    exact comparison)."""
    ref = _load_ref("cifar_2version")
    from cnn_pde_tpu.models import CIFAR10HybridPDEModel

    import contextlib
    import io

    torch.manual_seed(0)
    with contextlib.redirect_stdout(io.StringIO()):
        ref_model = ref.CIFAR10HybridPDEModel(dropout_rate=0.0)
    ref_model.train(train)
    ours = CIFAR10HybridPDEModel(dropout_rate=0.0)
    ext = ours.feature_extractor
    for sym in (ext.parabolic.sym, ext.hamiltonian.F_Y, ext.hamiltonian.F_Z):
        sym.compute_dtype = jnp.float32
    params, state = ours.init(key)
    fe, ref_fe = params["feature_extractor"], ref_model.feature_extractor

    for name in ("diffusion1", "diffusion2"):
        ref_pde = getattr(ref_fe, name)
        with torch.no_grad():
            ref_pde.alpha_time_coeff.copy_(torch.from_numpy(
                rng.standard_normal((3, 32, 32)).astype(np.float32) * 0.1))
        fe[name] = {
            k: jnp.asarray(getattr(ref_pde, k).detach().numpy().copy())
            for k in ("alpha_base", "beta_base", "alpha_time_coeff",
                      "beta_time_coeff", "channel_mixing")}
    fe["parabolic"]["sym"], state["feature_extractor"]["parabolic"]["sym"] = \
        _copy_sym_weights(ref_fe.parabolic.symmetric_layer,
                          fe["parabolic"]["sym"],
                          state["feature_extractor"]["parabolic"]["sym"])
    for ours_k, ref_sym in (("F_Y", ref_fe.hamiltonian.F_Y),
                            ("F_Z", ref_fe.hamiltonian.F_Z)):
        fe["hamiltonian"][ours_k], \
            state["feature_extractor"]["hamiltonian"][ours_k] = \
            _copy_sym_weights(ref_sym, fe["hamiltonian"][ours_k],
                              state["feature_extractor"]["hamiltonian"][ours_k])
    fe["combination_weights"] = jnp.asarray(
        ref_fe.combination_weights.detach().numpy().copy())
    fn = ref_fe.feature_norm
    fe["feature_norm"] = {
        "scale": jnp.asarray(fn.weight.detach().numpy().copy()),
        "bias": jnp.asarray(fn.bias.detach().numpy().copy())}
    state["feature_extractor"]["feature_norm"] = {
        "mean": jnp.asarray(fn.running_mean.detach().numpy().copy()),
        "var": jnp.asarray(fn.running_var.detach().numpy().copy())}

    params["attention"]["pos_embed"] = jnp.asarray(
        ref_model.attention.pos_embed.detach().numpy().copy())
    for j in (0, 2, 4):
        lin = ref_model.attention.attention_net[j]
        params["attention"]["net"][str(j)] = {
            "w": jnp.asarray(lin.weight.detach().numpy().T.copy()),
            "b": jnp.asarray(lin.bias.detach().numpy().copy())}

    bn = ref_model.feature_bn
    params["feature_bn"] = {
        "scale": jnp.asarray(bn.weight.detach().numpy().copy()),
        "bias": jnp.asarray(bn.bias.detach().numpy().copy())}
    state["feature_bn"] = {
        "mean": jnp.asarray(bn.running_mean.detach().numpy().copy()),
        "var": jnp.asarray(bn.running_var.detach().numpy().copy())}

    net = ref_model.classifier.classifier
    for idx in (0, 4, 8, 12, 16):
        params["classifier"][str(idx)] = {
            "w": jnp.asarray(net[idx].weight.detach().numpy().T.copy()),
            "b": jnp.asarray(net[idx].bias.detach().numpy().copy())}
    for idx in (1, 5, 9, 13):
        params["classifier"][str(idx)] = {
            "scale": jnp.asarray(net[idx].weight.detach().numpy().copy()),
            "bias": jnp.asarray(net[idx].bias.detach().numpy().copy())}
        state["classifier"][str(idx)] = {
            "mean": jnp.asarray(net[idx].running_mean.detach().numpy().copy()),
            "var": jnp.asarray(net[idx].running_var.detach().numpy().copy())}

    x = rng.standard_normal((6, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        logits_ref = ref_model(torch.from_numpy(x)).numpy()
    logits, _ = ours(params, state, jnp.asarray(x), train=train)
    np.testing.assert_allclose(np.asarray(logits), logits_ref,
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("train", [True, False])
def test_tiny_imagenet_full_model_logits_parity(rng, key, train):
    """END-TO-END M13 parity: TinyImageNetClassifier (residual-diffusion
    front-end + ResNet-18 backbone) vs the actual tiny_imagenet.py model —
    every conv/BN/fc weight copied (our Conv2d kernels are torch OIHW
    layout, no transpose), both BN modes."""
    ref = _load_ref("tiny_imagenet")
    from cnn_pde_tpu.models import TinyImageNetClassifier

    import contextlib
    import io

    def copy_conv(dst, src):
        dst["w"] = jnp.asarray(src.weight.detach().numpy().copy())

    def copy_bn(pdst, sdst, src):
        pdst["scale"] = jnp.asarray(src.weight.detach().numpy().copy())
        pdst["bias"] = jnp.asarray(src.bias.detach().numpy().copy())
        sdst["mean"] = jnp.asarray(src.running_mean.detach().numpy().copy())
        sdst["var"] = jnp.asarray(src.running_var.detach().numpy().copy())

    torch.manual_seed(0)
    with contextlib.redirect_stdout(io.StringIO()):
        ref_model = ref.ImprovedTinyImageNetClassifier(
            num_classes=200, use_pde=True, dropout_rate=0.0)
    ref_model.train(train)
    ours = TinyImageNetClassifier(num_classes=200, use_pde=True,
                                  dropout_rate=0.0)
    params, state = ours.init(key)

    d = ref_model.diff
    params["diff"] = {
        k: jnp.asarray(getattr(d, k).detach().numpy().copy())
        for k in ("alpha_base", "beta_base", "channel_scaling")}
    copy_conv(params["conv1"], ref_model.conv1)
    copy_bn(params["bn1"], state["bn1"], ref_model.bn1)
    for si in range(4):
        ref_stage = getattr(ref_model, f"layer{si+1}")
        for bi in range(2):
            name = f"layer{si+1}.{bi}"
            rb = ref_stage[bi]
            copy_conv(params[name]["conv1"], rb.conv1)
            copy_bn(params[name]["bn1"], state[name]["bn1"], rb.bn1)
            copy_conv(params[name]["conv2"], rb.conv2)
            copy_bn(params[name]["bn2"], state[name]["bn2"], rb.bn2)
            if len(rb.shortcut) > 0:
                copy_conv(params[name]["sc_conv"], rb.shortcut[0])
                copy_bn(params[name]["sc_bn"], state[name]["sc_bn"],
                        rb.shortcut[1])
    params["fc"] = {
        "w": jnp.asarray(ref_model.fc.weight.detach().numpy().T.copy()),
        "b": jnp.asarray(ref_model.fc.bias.detach().numpy().copy())}

    x = rng.standard_normal((4, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        logits_ref = ref_model(torch.from_numpy(x)).numpy()
    logits, _ = ours(params, state, jnp.asarray(x), train=train)
    np.testing.assert_allclose(np.asarray(logits), logits_ref,
                               rtol=1e-3, atol=1e-3)
