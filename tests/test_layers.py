"""Layer unit tests vs NumPy references (mirrors the reference's
test/utest/core23_layer_test/ strategy of checking fprop against host
implementations)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hugectr_tpu.core.config import DenseLayer, Layer_t
from hugectr_tpu.layers.base import LAYER_REGISTRY, LayerCtx
from hugectr_tpu.layers import network as network_mod  # populates registry


CTX = LayerCtx(training=True, compute_dtype=jnp.float32, rng=jax.random.key(0))


def run_layer(layer_type, ins, **kwargs):
    cfg = DenseLayer(layer_type=layer_type, bottom_names=["x"], top_names=["y"], **kwargs)
    impl = LAYER_REGISTRY[layer_type]
    shapes = [tuple(x.shape) for x in ins]
    params, state, out_shapes = impl.init(jax.random.key(1), cfg, shapes)
    outs, _ = impl.apply(params, state, [jnp.asarray(x) for x in ins], cfg, CTX)
    for o, s in zip(outs, out_shapes):
        assert tuple(o.shape) == tuple(s), f"{layer_type}: {o.shape} != {s}"
    return [np.asarray(o) for o in outs], params


def test_interaction_layer():
    rng = np.random.default_rng(0)
    b, f, e = 8, 5, 16
    dense = rng.normal(size=(b, e)).astype(np.float32)
    emb = rng.normal(size=(b, f, e)).astype(np.float32)
    (out,), _ = run_layer(Layer_t.Interaction, [dense, emb])
    assert out.shape == (b, e + (f + 1) * f // 2 + 1)
    x = np.concatenate([dense[:, None, :], emb], axis=1)
    dots = np.einsum("bie,bje->bij", x, x)
    iu, ju = np.tril_indices(f + 1, k=-1)
    ref = np.concatenate(
        [dense, dots[:, iu, ju], np.zeros((b, 1), np.float32)], axis=1
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_multicross_v1_shape_and_math():
    rng = np.random.default_rng(1)
    b, n = 4, 8
    x = rng.normal(size=(b, n)).astype(np.float32)
    (out,), params = run_layer(Layer_t.MultiCross, [x], num_layers=2)
    x0 = x.copy()
    cur = x.copy()
    for i in range(2):
        w = np.asarray(params[f"w_{i}"])
        bb = np.asarray(params[f"b_{i}"])
        xw = cur @ w
        cur = x0 * xw[:, None] + bb + cur
    np.testing.assert_allclose(out, cur, rtol=1e-4, atol=1e-5)


def test_multicross_v2_low_rank():
    rng = np.random.default_rng(2)
    b, n = 4, 8
    x = rng.normal(size=(b, n)).astype(np.float32)
    (out,), params = run_layer(
        Layer_t.MultiCross, [x], num_layers=1, projection_dim=4
    )
    u, v, bb = (np.asarray(params[k]) for k in ("U_0", "V_0", "b_0"))
    ref = x * (x @ u @ v + bb) + x
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_fm_order2():
    rng = np.random.default_rng(3)
    b, fields, k = 4, 6, 10
    x = rng.normal(size=(b, fields * k)).astype(np.float32)
    (out,), _ = run_layer(Layer_t.FmOrder2, [x], out_dim=k)
    v = x.reshape(b, fields, k)
    ref = 0.5 * ((v.sum(1)) ** 2 - (v**2).sum(1))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_weight_multiply():
    rng = np.random.default_rng(4)
    b, slots, vec = 4, 13, 10
    x = rng.normal(size=(b, slots)).astype(np.float32)
    (out,), params = run_layer(Layer_t.WeightMultiply, [x], weight_dims=[slots, vec])
    w = np.asarray(params["weight"])
    ref = (x[:, :, None] * w[None]).reshape(b, -1)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_mlp_shapes_and_activation():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(8, 32)).astype(np.float32)
    (out,), params = run_layer(Layer_t.MLP, [x], num_outputs=[64, 16])
    assert out.shape == (8, 16)
    h = np.maximum(x @ np.asarray(params["weight_0"]) + np.asarray(params["bias_0"]), 0)
    ref = np.maximum(h @ np.asarray(params["weight_1"]) + np.asarray(params["bias_1"]), 0)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_slice_and_concat():
    x = np.arange(24, dtype=np.float32).reshape(2, 12)
    cfg = DenseLayer(Layer_t.Slice, ["x"], ["a", "b"], ranges=[(0, 4), (4, 12)])
    impl = LAYER_REGISTRY[Layer_t.Slice]
    _, _, shapes = impl.init(jax.random.key(0), cfg, [(2, 12)])
    outs, _ = impl.apply({}, {}, [jnp.asarray(x)], cfg, CTX)
    np.testing.assert_array_equal(np.asarray(outs[0]), x[:, :4])
    np.testing.assert_array_equal(np.asarray(outs[1]), x[:, 4:])
    (cat,), _ = run_layer(Layer_t.Concat, [x[:, :4], x[:, 4:]], axis=1)
    np.testing.assert_array_equal(cat, x)


def test_batchnorm_train_stats():
    rng = np.random.default_rng(6)
    x = rng.normal(loc=3.0, scale=2.0, size=(64, 8)).astype(np.float32)
    (out,), _ = run_layer(Layer_t.BatchNorm, [x], factor=1.0, eps=1e-5)
    np.testing.assert_allclose(out.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(out.std(0), 1.0, atol=1e-2)


def test_sequence_mask_and_mha():
    lens = np.array([[2], [4]], dtype=np.float32)
    cfg = DenseLayer(
        Layer_t.SequenceMask,
        ["a", "b"],
        ["m"],
        max_sequence_len_from=4,
        max_sequence_len_to=4,
    )
    impl = LAYER_REGISTRY[Layer_t.SequenceMask]
    outs, _ = impl.apply({}, {}, [jnp.asarray(lens), jnp.asarray(lens)], cfg, CTX)
    m = np.asarray(outs[0])
    assert m.shape == (2, 1, 4, 4)
    assert m[0, 0, :2, :2].all() and not m[0, 0, 2:, :].any()

    rng = np.random.default_rng(7)
    q = rng.normal(size=(2, 4, 16)).astype(np.float32)
    (out,), _ = run_layer(
        Layer_t.MultiHeadAttention, [q, q, q, m], num_attention_heads=2
    )
    assert out.shape == (2, 4, 16)
    # masked row attention should only mix unmasked positions
    assert np.isfinite(out).all()


def test_losses():
    logits = np.array([[0.5], [-1.0]], dtype=np.float32)
    labels = np.array([[1.0], [0.0]], dtype=np.float32)
    cfg = DenseLayer(Layer_t.BinaryCrossEntropyLoss, ["p", "l"], ["loss"])
    impl = LAYER_REGISTRY[Layer_t.BinaryCrossEntropyLoss]
    outs, _ = impl.apply({}, {}, [jnp.asarray(logits), jnp.asarray(labels)], cfg, CTX)
    p = 1 / (1 + np.exp(-logits))
    ref = -(labels * np.log(p) + (1 - labels) * np.log(1 - p))
    np.testing.assert_allclose(np.asarray(outs[0]), ref, rtol=1e-5)


def test_network_end_to_end_grad():
    """Small DCN-ish network: loss decreases with SGD over a few steps."""
    from hugectr_tpu.layers.network import Network
    from hugectr_tpu.optim.dense import DenseOptimizer
    from hugectr_tpu.optim.params import OptParams
    from hugectr_tpu.core.types import Optimizer_t

    b, d = 64, 16
    layers = [
        DenseLayer(Layer_t.MultiCross, ["dense"], ["cross"], num_layers=2),
        DenseLayer(Layer_t.MLP, ["cross"], ["mlp"], num_outputs=[32, 1],
                   activations=["relu", "none"]),
        DenseLayer(Layer_t.BinaryCrossEntropyLoss, ["mlp", "label"], ["loss"]),
    ]
    net = Network(layers, {"dense": (b, d), "label": (b, 1)})
    params, state = net.init(jax.random.key(0))
    opt = DenseOptimizer(OptParams(Optimizer_t.SGD, lr=0.1))
    opt_state = opt.init(params)

    rng = np.random.default_rng(8)
    x = rng.normal(size=(b, d)).astype(np.float32)
    w_true = rng.normal(size=(d, 1)).astype(np.float32)
    y = (x @ w_true > 0).astype(np.float32)

    ctx = LayerCtx(training=True, compute_dtype=jnp.float32, rng=jax.random.key(1))

    @jax.jit
    def step(params, opt_state, state):
        def loss_fn(p):
            loss, (outs, new_state) = net.forward_with_loss(
                p, state, {"dense": x, "label": y}, ctx
            )
            return loss, new_state

        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        params, opt_state = opt.update(params, opt_state, grads, 0.1, 1)
        return params, opt_state, new_state, loss

    losses = []
    for _ in range(20):
        params, opt_state, state, loss = step(params, opt_state, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses


@pytest.mark.parametrize(
    "kind", ["sgd", "momentum_sgd", "nesterov", "adagrad", "rmsprop", "adam", "ftrl"]
)
def test_dense_optimizers_step(kind):
    from hugectr_tpu.optim.dense import DenseOptimizer
    from hugectr_tpu.optim.params import OptParams

    params = {"w": jnp.ones((4,), jnp.float32)}
    grads = {"w": jnp.full((4,), 0.5, jnp.float32)}
    opt = DenseOptimizer(OptParams(kind, lr=0.1, momentum_factor=0.9))
    st = opt.init(params)
    p2, st2 = opt.update(params, st, grads, jnp.asarray(0.1), jnp.asarray(1))
    assert np.all(np.asarray(p2["w"]) != 1.0) or kind == "ftrl"
    # a second step must also work (state threading)
    p3, _ = opt.update(p2, st2, grads, jnp.asarray(0.1), jnp.asarray(2))
    assert np.isfinite(np.asarray(p3["w"])).all()


def test_sparse_dense_optimizer_agreement():
    """Sparse per-row update == dense update when every row has a gradient."""
    from hugectr_tpu.embedding import sparse_optimizer
    from hugectr_tpu.optim.dense import DenseOptimizer
    from hugectr_tpu.optim.params import OptParams
    from hugectr_tpu.core.types import Optimizer_t

    rng = np.random.default_rng(9)
    rows, ev = 6, 4
    table = rng.normal(size=(rows, ev)).astype(np.float32)
    grads = rng.normal(size=(rows, ev)).astype(np.float32)
    for kind in (
        Optimizer_t.SGD,
        Optimizer_t.AdaGrad,
        Optimizer_t.Adam,
        Optimizer_t.FTRL,
        Optimizer_t.MomentumSGD,
        Optimizer_t.Nesterov,
        Optimizer_t.RMSProp,
    ):
        op = OptParams(kind, lr=0.05, momentum_factor=0.9)
        sp_state = sparse_optimizer.init_state(op, rows, ev)
        t1, _ = sparse_optimizer.apply_sparse(
            op,
            jnp.asarray(table),
            sp_state,
            jnp.arange(rows),
            jnp.arange(rows, dtype=jnp.int32),
            jnp.asarray(grads),
            jnp.asarray(0.05),
            jnp.asarray(1),
        )
        dopt = DenseOptimizer(op)
        dstate = dopt.init({"t": jnp.asarray(table)})
        d1, _ = dopt.update(
            {"t": jnp.asarray(table)},
            dstate,
            {"t": jnp.asarray(grads)},
            jnp.asarray(0.05),
            jnp.asarray(1),
        )
        np.testing.assert_allclose(
            np.asarray(t1), np.asarray(d1["t"]), rtol=1e-5, atol=1e-6,
            err_msg=str(kind),
        )
