"""Backbone/MsTransformer converter parity: build torch replicas with the
EXACT state_dict key layout of torchvision / efficientnet-pytorch / the
official EMSTransPoseNet, run random weights through the converters
(features/convert_backbones.py), and compare flax vs torch forwards.

(The env has no torchvision/efficientnet-pytorch — replicas mirror their
module trees, which is precisely what the converters consume.)
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from nefes_tpu.features.backbones import (  # noqa: E402
    EfficientNet, MobileNetV2, ResNet34,
)
from nefes_tpu.features.convert_backbones import (  # noqa: E402
    convert_efficientnet, convert_mobilenet_v2, convert_mstransformer,
    convert_posenet_res34, convert_posenet_v2, convert_resnet34,
)

torch.manual_seed(0)


def sd_numpy(m: tnn.Module) -> dict:
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


# ----------------------------------------------------------------------
# torchvision resnet34 replica
# ----------------------------------------------------------------------

class TBasic(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        h = F.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return F.relu(h + idt)


class TResNet34(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        chans, cin = (64, 128, 256, 512), 64
        for s, (n, c) in enumerate(zip((3, 4, 6, 3), chans)):
            blocks = []
            for i in range(n):
                blocks.append(TBasic(cin, c, 2 if (i == 0 and s > 0) else 1))
                cin = c
            setattr(self, f"layer{s + 1}", tnn.Sequential(*blocks))

    def forward(self, x):
        h = F.relu(self.bn1(self.conv1(x)))
        h = self.maxpool(h)
        for s in range(4):
            h = getattr(self, f"layer{s + 1}")(h)
        return h.mean((2, 3))


def _randomize_bn(m):
    """non-trivial BN running stats so conversion actually matters."""
    for mod in m.modules():
        if isinstance(mod, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
            mod.running_mean.uniform_(-0.2, 0.2)
            mod.running_var.uniform_(0.6, 1.5)
            mod.weight.data.uniform_(0.7, 1.3)
            mod.bias.data.uniform_(-0.2, 0.2)


def test_resnet34_parity():
    t = TResNet34().eval()
    _randomize_bn(t)
    params, stats = convert_resnet34(sd_numpy(t))
    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(
        np.float32)
    with torch.no_grad():
        want = t(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    got = ResNet34().apply({"params": params, "batch_stats": stats},
                           jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_posenet_res34_head():
    class TPoseNetRes34(tnn.Module):
        def __init__(self):
            super().__init__()
            self.feature_extractor = TResNet34()
            self.feature_extractor.fc = tnn.Linear(512, 2048)
            self.fc_pose = tnn.Linear(2048, 12)

        def forward(self, x):
            h = self.feature_extractor(x)
            h = self.feature_extractor.fc(h)
            return self.fc_pose(F.relu(h))

    t = TPoseNetRes34().eval()
    _randomize_bn(t)
    variables = convert_posenet_res34(sd_numpy(t))
    x = np.random.default_rng(1).normal(size=(1, 64, 64, 3)).astype(
        np.float32)
    with torch.no_grad():
        want = t(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    from nefes_tpu.features.posenet import PoseNetRes34
    # the flax module ImageNet-normalizes internally; undo for parity
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    got = PoseNetRes34().apply(variables, jnp.asarray(x * std + mean))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=3e-4)


# ----------------------------------------------------------------------
# torchvision mobilenet_v2 replica
# ----------------------------------------------------------------------

def tconvbn(cin, cout, k=3, stride=1, groups=1):
    return tnn.Sequential(
        tnn.Conv2d(cin, cout, k, stride, (k - 1) // 2, groups=groups,
                   bias=False),
        tnn.BatchNorm2d(cout), tnn.ReLU6(inplace=True))


class TInverted(tnn.Module):
    def __init__(self, cin, cout, stride, expand):
        super().__init__()
        hidden = cin * expand
        layers = []
        if expand != 1:
            layers.append(tconvbn(cin, hidden, k=1))
        layers += [tconvbn(hidden, hidden, k=3, stride=stride, groups=hidden),
                   tnn.Conv2d(hidden, cout, 1, bias=False),
                   tnn.BatchNorm2d(cout)]
        self.conv = tnn.Sequential(*layers)
        self.use_res = stride == 1 and cin == cout

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


class TMobileNetV2(tnn.Module):
    PLAN = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))

    def __init__(self):
        super().__init__()
        feats = [tconvbn(3, 32, k=3, stride=2)]
        cin = 32
        for e, c, n, s in self.PLAN:
            for i in range(n):
                feats.append(TInverted(cin, c, s if i == 0 else 1, e))
                cin = c
        feats.append(tconvbn(cin, 1280, k=1))
        self.features = tnn.Sequential(*feats)

    def forward(self, x):
        return self.features(x).mean((2, 3))


def test_mobilenet_v2_parity():
    t = TMobileNetV2().eval()
    _randomize_bn(t)
    params, stats = convert_mobilenet_v2(sd_numpy(t))
    # even spatial size => torch pad=1 equals TF SAME for stride 2 k3
    x = np.random.default_rng(2).normal(size=(1, 64, 64, 3)).astype(
        np.float32)
    with torch.no_grad():
        want = t(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    got = MobileNetV2().apply({"params": params, "batch_stats": stats},
                              jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_posenet_v2_head():
    class TPoseNetV2(tnn.Module):
        def __init__(self):
            super().__init__()
            self.backbone_net = TMobileNetV2()
            self.fc_pose = tnn.Linear(1280, 12)

        def forward(self, x):
            return self.fc_pose(self.backbone_net(x))

    t = TPoseNetV2().eval()
    _randomize_bn(t)
    variables = convert_posenet_v2(sd_numpy(t))
    x = np.random.default_rng(3).normal(size=(1, 64, 64, 3)).astype(
        np.float32)
    with torch.no_grad():
        want = t(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    from nefes_tpu.features.posenet import PoseNetV2
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    got = PoseNetV2().apply(variables, jnp.asarray(x * std + mean))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=3e-4)


# ----------------------------------------------------------------------
# lukemelas efficientnet replica (TF same-padding)
# ----------------------------------------------------------------------

class TFConv(tnn.Conv2d):
    """Conv2d with TF SAME padding (Conv2dStaticSamePadding equivalent)."""

    def forward(self, x):
        ih, iw = x.shape[-2:]
        kh, kw = self.kernel_size
        sh, sw = self.stride
        ph = max((math.ceil(ih / sh) - 1) * sh + kh - ih, 0)
        pw = max((math.ceil(iw / sw) - 1) * sw + kw - iw, 0)
        x = F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


def _round_filters(f, width):
    f *= width
    new = max(8, int(f + 4) // 8 * 8)
    if new < 0.9 * f:
        new += 8
    return int(new)


class TMBConv(tnn.Module):
    def __init__(self, cin, cout, k, stride, expand):
        super().__init__()
        hidden = cin * expand
        if expand != 1:
            self._expand_conv = TFConv(cin, hidden, 1, bias=False)
            self._bn0 = tnn.BatchNorm2d(hidden, eps=1e-3)
        self._depthwise_conv = TFConv(hidden, hidden, k, stride,
                                      groups=hidden, bias=False)
        self._bn1 = tnn.BatchNorm2d(hidden, eps=1e-3)
        se = max(1, int(cin * 0.25))
        self._se_reduce = TFConv(hidden, se, 1)
        self._se_expand = TFConv(se, hidden, 1)
        self._project_conv = TFConv(hidden, cout, 1, bias=False)
        self._bn2 = tnn.BatchNorm2d(cout, eps=1e-3)
        self.expand = expand
        self.use_res = stride == 1 and cin == cout

    def forward(self, x):
        h = x
        if self.expand != 1:
            h = F.silu(self._bn0(self._expand_conv(h)))
        h = F.silu(self._bn1(self._depthwise_conv(h)))
        s = h.mean((2, 3), keepdim=True)
        s = self._se_expand(F.silu(self._se_reduce(s)))
        h = h * torch.sigmoid(s)
        h = self._bn2(self._project_conv(h))
        return x + h if self.use_res else h


class TEfficientNet(tnn.Module):
    PLAN = ((1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5),
            (6, 80, 3, 2, 3), (6, 112, 3, 1, 5), (6, 192, 4, 2, 5),
            (6, 320, 1, 1, 3))

    def __init__(self, width=1.0, depth=1.0):
        super().__init__()
        cin = _round_filters(32, width)
        self._conv_stem = TFConv(3, cin, 3, 2, bias=False)
        self._bn0 = tnn.BatchNorm2d(cin, eps=1e-3)
        blocks = []
        for e, c, n, s, k in self.PLAN:
            c = _round_filters(c, width)
            for i in range(int(math.ceil(depth * n))):
                blocks.append(TMBConv(cin, c, k, s if i == 0 else 1, e))
                cin = c
        self._blocks = tnn.ModuleList(blocks)
        head = _round_filters(1280, width)
        self._conv_head = TFConv(cin, head, 1, bias=False)
        self._bn1 = tnn.BatchNorm2d(head, eps=1e-3)

    def forward(self, x, endpoints=False):
        h = F.silu(self._bn0(self._conv_stem(x)))
        eps = {}
        prev = h
        idx = 1
        for i, b in enumerate(self._blocks):
            h = b(h)
            if prev.shape[-1] > h.shape[-1]:  # reduction boundary
                eps[f"reduction_{idx}"] = prev
                idx += 1
            prev = h
        h = F.silu(self._bn1(self._conv_head(h)))
        if endpoints:
            return h, eps
        return h.mean((2, 3))


def test_efficientnet_b0_parity():
    t = TEfficientNet().eval()
    _randomize_bn(t)
    params, stats = convert_efficientnet(sd_numpy(t))
    x = np.random.default_rng(4).normal(size=(1, 64, 64, 3)).astype(
        np.float32)
    with torch.no_grad():
        want = t(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    got = EfficientNet(variant="b0").apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)


def test_efficientnet_b3_structure():
    """B3 (width 1.2 / depth 1.4): the converter must cover every flax
    param with exactly matching shapes."""
    t = TEfficientNet(width=1.2, depth=1.4)
    params, stats = convert_efficientnet(sd_numpy(t))
    ref = EfficientNet(variant="b3").init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    want_p = jax.tree.map(lambda x: x.shape, ref["params"])
    got_p = jax.tree.map(lambda x: np.asarray(x).shape, params)
    assert want_p == got_p
    want_s = jax.tree.map(lambda x: x.shape, ref["batch_stats"])
    got_s = jax.tree.map(lambda x: np.asarray(x).shape, stats)
    assert want_s == got_s


# ----------------------------------------------------------------------
# EMSTransPoseNet replica (transformer branches + heads)
# ----------------------------------------------------------------------

class TEncLayer(tnn.Module):
    def __init__(self, d=256, nhead=4, ffn=256):
        super().__init__()
        self.self_attn = tnn.MultiheadAttention(d, nhead)
        self.linear1 = tnn.Linear(d, ffn)
        self.linear2 = tnn.Linear(ffn, d)
        self.norm1 = tnn.LayerNorm(d)
        self.norm2 = tnn.LayerNorm(d)

    def forward(self, src, pos):
        h = self.norm1(src)
        q = k = h + pos
        src = src + self.self_attn(q, k, h)[0]
        h = self.norm2(src)
        return src + self.linear2(F.gelu(self.linear1(h)))


class TDecLayer(tnn.Module):
    def __init__(self, d=256, nhead=4, ffn=256):
        super().__init__()
        self.self_attn = tnn.MultiheadAttention(d, nhead)
        self.multihead_attn = tnn.MultiheadAttention(d, nhead)
        self.linear1 = tnn.Linear(d, ffn)
        self.linear2 = tnn.Linear(ffn, d)
        self.norm1 = tnn.LayerNorm(d)
        self.norm2 = tnn.LayerNorm(d)
        self.norm3 = tnn.LayerNorm(d)

    def forward(self, tgt, memory, pos, query_pos):
        h = self.norm1(tgt)
        q = k = h + query_pos
        tgt = tgt + self.self_attn(q, k, h)[0]
        h = self.norm2(tgt)
        tgt = tgt + self.multihead_attn(h + query_pos, memory + pos,
                                        memory)[0]
        h = self.norm3(tgt)
        return tgt + self.linear2(F.gelu(self.linear1(h)))


class TBranchWrap(tnn.Module):
    """Mirrors reference Transformer key layout: encoder.layers.N /
    encoder.norm / decoder.layers.N / decoder.norm."""

    def __init__(self, d=256, nhead=4, ffn=256, layers=2):
        super().__init__()
        enc = tnn.Module()
        enc.layers = tnn.ModuleList([TEncLayer(d, nhead, ffn)
                                     for _ in range(layers)])
        enc.norm = tnn.LayerNorm(d)
        dec = tnn.Module()
        dec.layers = tnn.ModuleList([TDecLayer(d, nhead, ffn)
                                     for _ in range(layers)])
        dec.norm = tnn.LayerNorm(d)
        self.encoder = enc
        self.decoder = dec

    def forward(self, src, pos, query):
        # src/pos: (S, B, C); query: (Q, C)
        h = src
        for l in self.encoder.layers:
            h = l(h, pos)
        memory = self.encoder.norm(h)
        B = src.shape[1]
        q = query[:, None].repeat(1, B, 1)
        tgt = torch.zeros_like(q)
        for l in self.decoder.layers:
            tgt = l(tgt, memory, pos, q)
        return self.decoder.norm(tgt)


def test_transformer_branch_parity():
    """The riskiest mapping: torch MultiheadAttention packed qkv -> flax
    MultiHeadDotProductAttention, pre-norm DETR layers."""
    from nefes_tpu.features.mstransformer import TransformerBranch
    from nefes_tpu.features.convert_backbones import _branch

    d, nhead, layers = 64, 4, 2
    t = TBranchWrap(d, nhead, d, layers).eval()
    sd = {f"X.{k}": v.detach().numpy() for k, v in t.state_dict().items()}
    params = _branch(sd, "X", layers, d, nhead)

    rng = np.random.default_rng(5)
    S, B, Q = 12, 2, 3
    src = rng.normal(size=(S, B, d)).astype(np.float32)
    pos = rng.normal(size=(S, B, d)).astype(np.float32)
    query = rng.normal(size=(Q, d)).astype(np.float32)
    with torch.no_grad():
        want = t(torch.tensor(src), torch.tensor(pos),
                 torch.tensor(query)).numpy()       # (Q, B, d)

    got = TransformerBranch(d, nhead, d, layers).apply(
        {"params": params},
        jnp.asarray(src).transpose(1, 0, 2),
        jnp.asarray(pos).transpose(1, 0, 2), jnp.asarray(query))
    # 4 residual attention layers accumulate f32 reduction-order noise;
    # the single-MHA mapping is exact to 1e-7 (verified separately)
    np.testing.assert_allclose(np.asarray(got).transpose(1, 0, 2), want,
                               rtol=1e-3, atol=1e-3)


def test_mstransformer_full_conversion_structure_and_heads():
    """Full EMS checkpoint conversion: synthesize the official key layout,
    convert, check exact structural match vs MSTransPoseNet.init plus
    numeric parity of the gathered multi-scene regressor heads."""
    from nefes_tpu.features.mstransformer import (
        MSTransPoseNet, MultiScenePoseRegressor,
    )

    num_scenes, d = 7, 256
    rng = np.random.default_rng(6)
    sd = {}

    bb = TEfficientNet()
    for k, v in bb.state_dict().items():
        sd[f"backbone.0.body.{k}"] = v.detach().numpy()
    sd["backbone.1.row_embed.weight"] = rng.normal(
        size=(50, d // 2)).astype(np.float32)
    sd["backbone.1.col_embed.weight"] = rng.normal(
        size=(50, d // 2)).astype(np.float32)
    for name, cin in (("t", 112), ("rot", 40)):
        sd[f"input_proj_{name}.weight"] = rng.normal(
            0, 0.02, size=(d, cin, 1, 1)).astype(np.float32)
        sd[f"input_proj_{name}.bias"] = np.zeros(d, np.float32)
        sd[f"query_embed_{name}.weight"] = rng.normal(
            size=(num_scenes, d)).astype(np.float32)
        br = TBranchWrap(d, 4, d, 6)
        for k, v in br.state_dict().items():
            sd[f"transformer_{name}.{k}"] = v.detach().numpy()
    sd["scene_embed.weight"] = rng.normal(0, 0.02,
                                          size=(1, 2 * d)).astype(np.float32)
    sd["scene_embed.bias"] = np.zeros(1, np.float32)
    for name, out in (("t", 3), ("rot", 4)):
        for s in range(num_scenes):
            sd[f"regressor_head_{name}.{s}.fc_h.weight"] = rng.normal(
                0, 0.02, size=(1024, d)).astype(np.float32)
            sd[f"regressor_head_{name}.{s}.fc_h.bias"] = rng.normal(
                size=(1024,)).astype(np.float32)
            sd[f"regressor_head_{name}.{s}.fc_o.weight"] = rng.normal(
                0, 0.02, size=(out, 1024)).astype(np.float32)
            sd[f"regressor_head_{name}.{s}.fc_o.bias"] = rng.normal(
                size=(out,)).astype(np.float32)

    variables = convert_mstransformer(sd, num_scenes=num_scenes)

    model = MSTransPoseNet(num_scenes=num_scenes)
    ref = model.init(jax.random.key(0), jnp.zeros((1, 256, 320, 3)))
    want_shapes = jax.tree.map(lambda x: x.shape, ref["params"])
    got_shapes = jax.tree.map(lambda x: np.asarray(x).shape,
                              variables["params"])
    assert want_shapes == got_shapes

    # gathered multi-scene head == the per-scene torch head it came from
    head = MultiScenePoseRegressor(num_scenes, 3, d)
    x = rng.normal(size=(2, d)).astype(np.float32)
    for scene in (0, 4):
        got = head.apply(
            {"params": variables["params"]["regressor_head_t"]},
            jnp.asarray(x), jnp.asarray([scene, scene]))
        wh = sd[f"regressor_head_t.{scene}.fc_h.weight"]
        bh = sd[f"regressor_head_t.{scene}.fc_h.bias"]
        wo = sd[f"regressor_head_t.{scene}.fc_o.weight"]
        bo = sd[f"regressor_head_t.{scene}.fc_o.bias"]
        want = torch.tensor(x) @ torch.tensor(wh).T + torch.tensor(bh)
        want = F.gelu(want) @ torch.tensor(wo).T + torch.tensor(bo)
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=2e-4, atol=2e-4)

    # and the whole converted model runs end to end
    out = model.apply(variables, jnp.zeros((1, 256, 320, 3)) + 0.5)
    assert out["pose"].shape == (1, 7)
    assert np.all(np.isfinite(np.asarray(out["pose"])))
