"""Numerical parity of the flax decoder against torch oracles built from
standard torch layers wired per the reference architecture, with weights
converted through parq_tpu.io.torch_convert. This is the checkpoint-parity
gate for everything downstream of the backbone."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from parq_tpu.io.torch_convert import (_conv1d_as_dense, _group_norm,
                                       _layer_norm, _linear, _mha)
from parq_tpu.models.decoder import DecoderLayer
from parq_tpu.models.mlp import HeadMLP

D, HEADS, FFN = 32, 4, 24


def to_jnp(tree):
    return jax.tree_util.tree_map(jnp.asarray, tree)


def test_mha_conversion_matches_torch(rng):
    torch.manual_seed(0)
    mha = tnn.MultiheadAttention(D, HEADS, dropout=0.0, batch_first=True)
    mha.eval()
    sd = {f"m.{k}": v.detach().numpy() for k, v in mha.state_dict().items()}

    tree = {}
    _mha(tree, "m", sd, "m", HEADS)
    params = to_jnp(tree["params"])

    import flax.linen as nn
    fmha = nn.MultiHeadDotProductAttention(
        num_heads=HEADS, qkv_features=D, out_features=D, dropout_rate=0.0,
        deterministic=True)

    q = rng.randn(2, 5, D).astype(np.float32)
    k = rng.randn(2, 9, D).astype(np.float32)
    v = rng.randn(2, 9, D).astype(np.float32)
    got = fmha.apply({"params": params["m"]}, jnp.asarray(q), jnp.asarray(k),
                     jnp.asarray(v))
    with torch.no_grad():
        expect, _ = mha(torch.from_numpy(q), torch.from_numpy(k),
                        torch.from_numpy(v))
    np.testing.assert_allclose(np.asarray(got), expect.numpy(), atol=2e-5)


class TorchDecoderLayer(tnn.Module):
    """Oracle wired per ref transformer_parq.py:340-386 (post-norm)."""

    def __init__(self):
        super().__init__()
        self.self_attn = tnn.MultiheadAttention(D, HEADS, dropout=0.0,
                                                batch_first=True)
        self.multihead_attn = tnn.MultiheadAttention(D, HEADS, dropout=0.0,
                                                     batch_first=True)
        self.linear1 = tnn.Linear(D, FFN)
        self.linear2 = tnn.Linear(FFN, D)
        self.norm1 = tnn.LayerNorm(D)
        self.norm2 = tnn.LayerNorm(D)
        self.norm3 = tnn.LayerNorm(D)

    def forward(self, tgt, memory, query_pos):
        q = k = tgt + query_pos
        tgt2, _ = self.self_attn(q, k, tgt)
        tgt = self.norm1(tgt + tgt2)
        tgt2, _ = self.multihead_attn(tgt + query_pos, memory, memory)
        tgt = self.norm2(tgt + tgt2)
        tgt2 = self.linear2(F.relu(self.linear1(tgt)))
        tgt = self.norm3(tgt + tgt2)
        return tgt


def test_decoder_layer_matches_torch(rng):
    """Split cross-attention (K/V hoisted out of the layer) must equal the
    reference's single nn.MultiheadAttention layer with converted weights."""
    import flax.linen as nn
    from parq_tpu.io.torch_convert import _mha_split_cross

    torch.manual_seed(1)
    oracle = TorchDecoderLayer().eval()
    sd = {f"l.{k}": v.detach().numpy() for k, v in oracle.state_dict().items()}

    tree = {}
    _mha(tree, "l.self_attn", sd, "dec/layer/self_attn", HEADS)
    _mha_split_cross(tree, "l.multihead_attn", sd, layer_path="dec/layer",
                     dec_path="dec", num_heads=HEADS)
    _linear(tree, "l.linear1", sd, "dec/layer/linear1")
    _linear(tree, "l.linear2", sd, "dec/layer/linear2")
    for n in ("norm1", "norm2", "norm3"):
        _layer_norm(tree, f"l.{n}", sd, f"dec/layer/{n}")
    params = to_jnp(tree["params"])

    class Harness(nn.Module):
        @nn.compact
        def __call__(self, tgt, mem, pos):
            hd = D // HEADS
            k = nn.DenseGeneral((HEADS, hd), name="cross_attn_key")(mem)
            v = nn.DenseGeneral((HEADS, hd), name="cross_attn_value")(mem)
            # head-major (B,H,N,D) interchange, as PARQDecoder now feeds it
            return DecoderLayer(D, HEADS, FFN, dropout_rate=0.0,
                                deterministic=True, name="layer")(
                tgt, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), pos)

    tgt = rng.randn(2, 6, D).astype(np.float32)
    mem = rng.randn(2, 17, D).astype(np.float32)
    pos = rng.randn(2, 6, D).astype(np.float32)
    got = Harness().apply({"params": params["dec"]}, jnp.asarray(tgt),
                          jnp.asarray(mem), jnp.asarray(pos))
    with torch.no_grad():
        expect = oracle(torch.from_numpy(tgt), torch.from_numpy(mem),
                        torch.from_numpy(pos))
    np.testing.assert_allclose(np.asarray(got), expect.numpy(), atol=3e-5)


class TorchHead(tnn.Module):
    """GenericMLP conv-mode oracle (ref: generic_mlp.py:64-132): input is
    (B, C, N); hidden Conv1d(no bias)+GroupNorm(1)+ReLU+Dropout(0), output
    Conv1d(bias)."""

    def __init__(self, hidden, out):
        super().__init__()
        layers = []
        prev = D
        for h in hidden:
            layers += [tnn.Conv1d(prev, h, 1, bias=False),
                       tnn.GroupNorm(1, h), tnn.ReLU(), tnn.Dropout(0.0)]
            prev = h
        layers.append(tnn.Conv1d(prev, out, 1, bias=True))
        self.layers = tnn.Sequential(*layers)

    def forward(self, x):
        return self.layers(x)


@pytest.mark.parametrize("hidden,out", [((), 10), ((D, D), 3)])
def test_head_mlp_matches_torch(rng, hidden, out):
    torch.manual_seed(2)
    oracle = TorchHead(hidden, out).eval()
    sd = {f"h.{k}": v.detach().numpy() for k, v in oracle.state_dict().items()}

    from parq_tpu.io.torch_convert import _head_mlp
    tree = {}
    _head_mlp(tree, "h", sd, "h", len(hidden))
    params = to_jnp(tree["params"]["h"])

    head = HeadMLP(hidden, out)
    x = rng.randn(2, 7, D).astype(np.float32)
    got = head.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        # torch oracle consumes (B, C, N) and returns (B, out, N)
        expect = oracle(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1)
    np.testing.assert_allclose(np.asarray(got), expect.numpy(), atol=2e-5)


def test_frozen_bn_and_conv_conversion(rng):
    """Conv2d + FrozenBN-style eval BatchNorm mapping."""
    from parq_tpu.io.torch_convert import _conv2d, _frozen_bn
    from parq_tpu.models.resnet_fpn import FrozenBatchNorm
    import flax.linen as nn

    torch.manual_seed(3)
    conv = tnn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False)
    bn = tnn.BatchNorm2d(8).eval()
    bn.running_mean.normal_()
    bn.running_var.uniform_(0.5, 2.0)
    bn.weight.data.normal_()
    bn.bias.data.normal_()

    sd = {f"c.{k}": v.detach().numpy() for k, v in conv.state_dict().items()}
    sd.update({f"b.{k}": v.detach().numpy() for k, v in bn.state_dict().items()})
    tree = {}
    _conv2d(tree, "c", sd, "c")
    _frozen_bn(tree, "b", sd, "b")

    x = rng.randn(2, 10, 12, 3).astype(np.float32)

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        use_bias=False, name="c")(x)
            return FrozenBatchNorm(8, name="b")(x)

    got = Net().apply(to_jnp(tree), jnp.asarray(x))
    with torch.no_grad():
        expect = bn(conv(torch.from_numpy(x).permute(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(got),
                               expect.permute(0, 2, 3, 1).numpy(), atol=1e-4)
