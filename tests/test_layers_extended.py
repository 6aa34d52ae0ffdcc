"""Extended layer oracles (reference: test/utest/core23_layer_test/ —
each layer vs a host reference implementation)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hugectr_tpu.core.config import DenseLayer, Layer_t
from hugectr_tpu.layers.base import LAYER_REGISTRY, LayerCtx
from hugectr_tpu.layers import network  # noqa: F401 (registry)

CTX = LayerCtx(training=True, compute_dtype=jnp.float32, rng=jax.random.key(0))
EVAL = LayerCtx(training=False, compute_dtype=jnp.float32, rng=None)


def run(layer_type, ins, cfg_kwargs=None, ctx=CTX, seed=0):
    cfg = DenseLayer(
        layer_type=layer_type,
        bottom_names=[f"b{i}" for i in range(len(ins))],
        top_names=["t0"],
        **(cfg_kwargs or {}),
    )
    cfg._num_tops = 1
    impl = LAYER_REGISTRY[layer_type]
    shapes = [x.shape for x in ins]
    params, state, _ = impl.init(jax.random.key(seed), cfg, shapes)
    outs, _ = impl.apply(params, state, [jnp.asarray(x) for x in ins], cfg, ctx)
    return [np.asarray(o) for o in outs], params


def test_scale_axis0_and_axis1():
    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    (out,), _ = run(Layer_t.Scale, [x], {"axis": 0, "factor": 2})
    # each element repeated twice consecutively (upscale_kernel axis==0)
    np.testing.assert_allclose(out[0], [0, 0, 1, 1, 2, 2])
    (out,), _ = run(Layer_t.Scale, [x], {"axis": 1, "factor": 2})
    assert out.shape == (4, 3)
    np.testing.assert_allclose(out[0], out[1])
    np.testing.assert_allclose(out[0], x[0])


def test_prelu_dice():
    x = np.random.default_rng(0).normal(size=(64, 8)).astype(np.float32)
    (out,), _ = run(Layer_t.PReLU_Dice, [x], {"elu_alpha": 0.2, "eps": 1e-8})
    # Dice: p(x)*x + (1-p(x))*alpha*x with p = sigmoid((x-mean)/std)
    mean, var = x.mean(0), x.var(0)
    p = 1.0 / (1.0 + np.exp(-(x - mean) / np.sqrt(var + 1e-8)))
    want = p * x + (1 - p) * 0.2 * x
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_fused_reshape_concat():
    good = np.random.default_rng(1).normal(size=(4, 3, 5)).astype(np.float32)
    cate = np.random.default_rng(2).normal(size=(4, 3, 2)).astype(np.float32)
    cfg = DenseLayer(
        layer_type=Layer_t.FusedReshapeConcat,
        bottom_names=["g", "c"],
        top_names=["his", "item"],
    )
    cfg._num_tops = 2
    impl = LAYER_REGISTRY[Layer_t.FusedReshapeConcat]
    params, state, shapes = impl.init(jax.random.key(0), cfg, [good.shape, cate.shape])
    outs, _ = impl.apply({}, {}, [jnp.asarray(good), jnp.asarray(cate)], cfg, CTX)
    his, item = (np.asarray(o) for o in outs)
    assert his.shape == (4 * 2, 7) and item.shape == (4, 7)
    np.testing.assert_allclose(item, np.concatenate([good[:, -1], cate[:, -1]], 1))
    np.testing.assert_allclose(his[0], np.concatenate([good[0, 0], cate[0, 0]]))


def test_gru_shapes_and_recurrence():
    b, s, v, h = 4, 5, 3, 6
    x = np.random.default_rng(3).normal(size=(b, s * v)).astype(np.float32)
    (out,), params = run(
        Layer_t.GRU,
        [x],
        {"num_output": h, "SeqLength": s, "vector_size": v, "batchsize": b},
    )
    assert out.shape == (b, s * h)
    assert np.isfinite(out).all()
    # zero input with zero biases -> all-zero hidden states
    (out0,), _ = run(
        Layer_t.GRU,
        [np.zeros_like(x)],
        {"num_output": h, "SeqLength": s, "vector_size": v, "batchsize": b},
    )
    np.testing.assert_allclose(out0, 0.0, atol=1e-6)


def test_layernorm():
    x = np.random.default_rng(4).normal(size=(8, 16)).astype(np.float32) * 3 + 1
    (out,), _ = run(Layer_t.LayerNorm, [x], {"eps": 1e-5})
    np.testing.assert_allclose(out.mean(-1), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.std(-1), 1.0, atol=1e-2)


def test_dropout_train_vs_eval():
    x = np.ones((128, 64), np.float32)
    (out_train,), _ = run(Layer_t.Dropout, [x], {"dropout_rate": 0.5}, ctx=CTX)
    (out_eval,), _ = run(Layer_t.Dropout, [x], {"dropout_rate": 0.5}, ctx=EVAL)
    np.testing.assert_allclose(out_eval, x)
    kept = out_train != 0
    assert 0.3 < kept.mean() < 0.7
    # inverted scaling keeps the expectation
    np.testing.assert_allclose(out_train[kept], 2.0, rtol=1e-5)


def test_select_gather_reduce():
    x = np.random.default_rng(5).normal(size=(6, 4, 3)).astype(np.float32)
    (out,), _ = run(Layer_t.Select, [x], {"dim": 1, "index": [0, 2]})
    np.testing.assert_allclose(out, x[:, [0, 2], :])
    (out,), _ = run(Layer_t.ReduceMean, [x], {"axis": 1})
    np.testing.assert_allclose(out, x.mean(1, keepdims=True), rtol=1e-5)
    (out,), _ = run(Layer_t.ReduceSum, [x], {"axis": 2})
    np.testing.assert_allclose(out, x.sum(2, keepdims=True), rtol=1e-5)


def test_softmax_and_elu():
    x = np.random.default_rng(6).normal(size=(5, 7)).astype(np.float32)
    (out,), _ = run(Layer_t.Softmax, [x])
    np.testing.assert_allclose(out.sum(-1), 1.0, rtol=1e-5)
    (out,), _ = run(Layer_t.ELU, [x], {"elu_alpha": 0.7})
    want = np.where(x > 0, x, 0.7 * (np.exp(x) - 1))
    np.testing.assert_allclose(out, want, rtol=1e-5)


def test_reshape_modes():
    x = np.arange(24, dtype=np.float32).reshape(2, 4, 3)
    (out,), _ = run(Layer_t.Reshape, [x], {"leading_dim": 12})
    assert out.shape == (2, 12)
    (out,), _ = run(Layer_t.Reshape, [x], {"leading_dim": 3, "time_step": 4})
    assert out.shape == (2, 4, 3)
    (out,), _ = run(Layer_t.Reshape, [x], {"shape": [-1, 6]})
    assert out.shape == (4, 6)
    (out,), _ = run(
        Layer_t.Reshape, [x], {"selected": True, "selected_slots": [0, 2]}
    )
    np.testing.assert_allclose(out, x[:, [0, 2], :].reshape(2, -1))


def test_gradients_flow_through_custom_layers():
    """Autodiff sanity: nonzero finite grads through the CTR interaction
    layers (reference checks bprop against CPU refs)."""
    for lt, kwargs, shape in [
        (Layer_t.MultiCross, {"num_layers": 2}, (8, 16)),
        (Layer_t.MultiCross, {"num_layers": 2, "projection_dim": 4}, (8, 16)),
        (Layer_t.FmOrder2, {"out_dim": 4}, (8, 12)),
        (Layer_t.WeightMultiply, {"weight_dims": [6, 3]}, (8, 6)),
    ]:
        cfg = DenseLayer(
            layer_type=lt, bottom_names=["b"], top_names=["t"], **kwargs
        )
        cfg._num_tops = 1
        impl = LAYER_REGISTRY[lt]
        x = jnp.asarray(
            np.random.default_rng(7).normal(size=shape).astype(np.float32)
        )
        params, state, _ = impl.init(jax.random.key(1), cfg, [shape])

        def loss(p, x):
            outs, _ = impl.apply(p, state, [x], cfg, CTX)
            return jnp.sum(outs[0] ** 2)

        gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
        for leaf in jax.tree.leaves((gp, gx)):
            assert np.isfinite(np.asarray(leaf)).all(), lt
        assert float(jnp.abs(gx).sum()) > 0, lt


def test_masked_softmax():
    rng = np.random.default_rng(8)
    # [B, h, F, T] scores with [B, 1, F, T] mask
    x = rng.normal(size=(2, 2, 3, 4)).astype(np.float32)
    mask = np.ones((2, 1, 3, 4), np.float32)
    mask[0, 0, :, 2:] = 0.0  # sample 0: only first 2 key positions valid
    cfg = DenseLayer(
        layer_type=Layer_t.MaskedSoftmax, bottom_names=["s", "m"], top_names=["t"]
    )
    cfg._num_tops = 1
    impl = LAYER_REGISTRY[Layer_t.MaskedSoftmax]
    outs, _ = impl.apply({}, {}, [jnp.asarray(x), jnp.asarray(mask)], cfg, CTX)
    out = np.asarray(outs[0])
    np.testing.assert_allclose(out.sum(-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(out[0, :, :, 2:], 0.0, atol=1e-6)


def test_cast_and_frc_general():
    x = np.random.default_rng(9).normal(size=(3, 4, 5)).astype(np.float32)
    (out,), _ = run(Layer_t.Cast, [x[:, 0, :]])
    np.testing.assert_allclose(out, x[:, 0, :])
    # Cast converts to the session compute dtype (cast_layer.cu analog)
    cfg = DenseLayer(layer_type=Layer_t.Cast, bottom_names=["b"], top_names=["t"])
    cfg._num_tops = 1
    impl = LAYER_REGISTRY[Layer_t.Cast]
    bf_ctx = LayerCtx(training=False, compute_dtype=jnp.bfloat16)
    outs, _ = impl.apply({}, {}, [jnp.asarray(x[:, 0, :])], cfg, bf_ctx)
    assert outs[0].dtype == jnp.bfloat16
    y = np.random.default_rng(10).normal(size=(3, 4, 2)).astype(np.float32)
    cfg = DenseLayer(
        layer_type=Layer_t.FusedReshapeConcatGeneral,
        bottom_names=["a", "b"],
        top_names=["t"],
    )
    cfg._num_tops = 1
    impl = LAYER_REGISTRY[Layer_t.FusedReshapeConcatGeneral]
    outs, _ = impl.apply({}, {}, [jnp.asarray(x), jnp.asarray(y)], cfg, CTX)
    out = np.asarray(outs[0])
    assert out.shape == (12, 7)
    np.testing.assert_allclose(out[0], np.concatenate([x[0, 0], y[0, 0]]))


def test_matrix_multiply_variants():
    rng = np.random.default_rng(11)
    a2 = rng.normal(size=(4, 5)).astype(np.float32)
    b2 = rng.normal(size=(5, 6)).astype(np.float32)
    (out,), _ = run(Layer_t.MatrixMultiply, [a2, b2])
    np.testing.assert_allclose(out, a2 @ b2, rtol=1e-5)
    a3 = rng.normal(size=(2, 3, 4)).astype(np.float32)
    b3 = rng.normal(size=(2, 4, 5)).astype(np.float32)
    (out,), _ = run(Layer_t.MatrixMultiply, [a3, b3])
    np.testing.assert_allclose(out, a3 @ b3, rtol=1e-5)
    b3t = rng.normal(size=(2, 5, 4)).astype(np.float32)
    (out,), _ = run(Layer_t.MatrixMultiply, [a3, b3t], {"transpose_b": True})
    np.testing.assert_allclose(out, a3 @ b3t.transpose(0, 2, 1), rtol=1e-5)
