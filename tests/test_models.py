"""Model zoo tests.

Shape parity against the reference's per-attack constructor table
(configs.ATTACK_PRESETS ← attack_config.txt:10-22 and load_model clones),
pooling semantics vs torch.nn.MaxPool2d, and LSTM numerics vs torch.nn.LSTM
with identical weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from audiobd_tpu.configs import ATTACK_PRESETS, linear_features_for
from audiobd_tpu.dsp.stft import num_frames
from audiobd_tpu.models import build_model
from audiobd_tpu.models.layers import LSTM, LSTMLayer, max_pool_torch

ATTACK_SHAPES = {
    "badnets": (101, 40),
    "jingleback": (101, 40),
    "ultrasonic": (100, 40),
    "daba": (32, 40),
    "flowmur": (32, 13),
}

ALL_MODELS = ["smallcnn", "largecnn", "smalllstm", "lstmwithattention", "rnn", "resnet"]


def _input_for(attack, batch=2):
    frames, n_mfcc = ATTACK_SHAPES[attack]
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((batch, 1, frames, n_mfcc)).astype(np.float32))


def test_attack_shape_table_consistent_with_dsp():
    for attack, (frames, n_mfcc) in ATTACK_SHAPES.items():
        dsp = ATTACK_PRESETS[attack]["dsp"]
        assert num_frames(dsp["sample_rate"], dsp["n_fft"], dsp["hop_length"]) == frames
        assert dsp["n_mfcc"] == n_mfcc


@pytest.mark.parametrize("attack", list(ATTACK_SHAPES))
@pytest.mark.parametrize("model_name", ALL_MODELS)
def test_model_builds_and_runs(attack, model_name):
    if attack == "badnets" and model_name not in ("smallcnn",):
        # badnets/jingleback share shapes; skip duplicates to keep CI fast.
        pytest.skip("covered by jingleback")
    n_mfcc = ATTACK_SHAPES[attack][1]
    feats = linear_features_for(attack, model_name)
    model = build_model(model_name, num_classes=10, feature_size=feats, n_mfcc=n_mfcc)
    x = _input_for(attack)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_train_mode_uses_dropout_and_updates_bn():
    model = build_model("smallcnn", 10, linear_features_for("jingleback", "smallcnn"))
    x = _input_for("jingleback")
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out1, mut = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"],
    )
    out2, _ = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
    )
    # Different dropout rngs → different outputs.
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    # Batch stats moved away from init.
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mut["batch_stats"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new))


@pytest.mark.parametrize(
    "window,stride,pad",
    [((2, 2), None, (1, 1)), ((1, 3), None, (0, 0)), ((3, 3), (2, 2), (0, 0)), ((2, 2), None, (0, 1))],
)
def test_max_pool_matches_torch(window, stride, pad):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 9, 7, 3)).astype(np.float32)  # NHWC
    ours = np.asarray(max_pool_torch(jnp.asarray(x), window, stride, pad))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
    pool = torch.nn.MaxPool2d(window, stride=stride or window, padding=pad)
    ref = pool(xt).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def _copy_lstm_weights_to_torch(params, tl, layer=0, suffix=""):
    pre = f"l{layer}"
    with torch.no_grad():
        getattr(tl, f"weight_ih_l{layer}{suffix}").copy_(
            torch.from_numpy(np.asarray(params[f"{pre}_fwd" if not suffix else f"{pre}_bwd"]["w_ih"]).T)
        )
        getattr(tl, f"weight_hh_l{layer}{suffix}").copy_(
            torch.from_numpy(np.asarray(params[f"{pre}_fwd" if not suffix else f"{pre}_bwd"]["w_hh"]).T)
        )
        getattr(tl, f"bias_ih_l{layer}{suffix}").copy_(
            torch.from_numpy(np.asarray(params[f"{pre}_fwd" if not suffix else f"{pre}_bwd"]["b_ih"]))
        )
        getattr(tl, f"bias_hh_l{layer}{suffix}").copy_(
            torch.from_numpy(np.asarray(params[f"{pre}_fwd" if not suffix else f"{pre}_bwd"]["b_hh"]))
        )


def test_lstm_matches_torch_unidirectional():
    b, t, f, h = 3, 11, 7, 5
    x = np.random.default_rng(2).standard_normal((b, t, f)).astype(np.float32)
    model = LSTM(hidden=h, num_layers=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))

    tl = torch.nn.LSTM(f, h, num_layers=2, batch_first=True)
    p = variables["params"]
    _copy_lstm_weights_to_torch(p, tl, layer=0)
    _copy_lstm_weights_to_torch(p, tl, layer=1)
    ref, _ = tl(torch.from_numpy(x))
    np.testing.assert_allclose(ours, ref.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_lstm_matches_torch_bidirectional():
    b, t, f, h = 2, 9, 6, 4
    x = np.random.default_rng(3).standard_normal((b, t, f)).astype(np.float32)
    model = LSTM(hidden=h, bidirectional=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))

    tl = torch.nn.LSTM(f, h, batch_first=True, bidirectional=True)
    _copy_lstm_weights_to_torch(variables["params"], tl, layer=0)
    _copy_lstm_weights_to_torch(variables["params"], tl, layer=0, suffix="_reverse")
    ref, _ = tl(torch.from_numpy(x))
    np.testing.assert_allclose(ours, ref.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_models_jit_and_grad():
    model = build_model("smallcnn", 10, 3072)
    x = _input_for("jingleback")
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    @jax.jit
    def loss_fn(params, x):
        out = model.apply({"params": params, "batch_stats": variables["batch_stats"]}, x, train=False)
        return jnp.mean(out**2)

    g = jax.grad(loss_fn)(variables["params"], x)
    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree_util.tree_leaves(g))


def test_smallcnn_im2col_parity():
    """The taps-matmul conv lowering must share the param tree with lax.conv
    and agree numerically (same math, different reduction lowering)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiobd_tpu.models import build_model

    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 1, 101, 40)), jnp.float32)
    a = build_model("smallcnn", 10, 3072)
    b = build_model("smallcnn", 10, 3072, conv_impl="im2col")
    va = a.init(jax.random.PRNGKey(0), x, train=False)
    vb = b.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(va) == jax.tree_util.tree_structure(vb)
    for la, lb in zip(jax.tree_util.tree_leaves(va), jax.tree_util.tree_leaves(vb)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    ya = a.apply(va, x, train=False)
    yb = b.apply(vb, x, train=False)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=2e-4, rtol=1e-5)
    # and through a train step (BN batch stats + dropout rngs)
    ya, sa = a.apply(va, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
                     mutable=["batch_stats"])
    yb, sb = b.apply(vb, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
                     mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=2e-3, rtol=1e-4)


@pytest.mark.parametrize("model_name", ["smallcnn", "smalllstm"])
def test_jit_init_matches_eager_init(model_name):
    # jit_init (one compiled program; kills the ~40-op eager avalanche over
    # the axon tunnel) must be bit-identical to eager model.init, or seeds
    # and checkpoint anchors silently shift.
    from audiobd_tpu.models import jit_init

    feats = linear_features_for("jingleback", model_name)
    model = build_model(model_name, num_classes=10, feature_size=feats, n_mfcc=40)
    x = np.zeros((1, 1, 101, 40), np.float32)
    eager = model.init(jax.random.PRNGKey(7), jnp.asarray(x), train=False)
    jitted = jit_init(model, jax.random.PRNGKey(7), x)
    flat_e = jax.tree_util.tree_leaves_with_path(eager)
    flat_j = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(jitted)}
    assert len(flat_e) == len(flat_j)
    for k, v in flat_e:
        np.testing.assert_array_equal(np.asarray(v), np.asarray(flat_j[jax.tree_util.keystr(k)]))
