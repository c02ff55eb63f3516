"""Converter parity tests: build torch replicas of the reference modules
(random weights), convert to flax, and require matching outputs. This is
the gate for the torchvision/paper_models weight dependency (SURVEY.md §7
step 5) that works without downloaded checkpoints."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nefes_tpu.features.dfnet import DFNet  # noqa: E402
from nefes_tpu.features.convert import (  # noqa: E402
    convert_dfnet, convert_fusion_net, convert_nerfh_nff,
)
from nefes_tpu.fields.nerfh_nff import FusionNet, NeRFHNFF  # noqa: E402


def build_torch_dfnet_replica():
    """Same layer structure + state_dict keys as reference feature/dfnet.py
    (VGG16 features + AdaptLayers + pose head), randomly initialised."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(tnn.ReLU(inplace=False))
            in_ch = v

    class TorchDFNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = tnn.Sequential(*layers)
            self.adaptation_layers = tnn.Module()
            for i, c in enumerate([64, 256, 512]):
                blk = tnn.Sequential(
                    tnn.Conv2d(c, 64, 1), tnn.ReLU(),
                    tnn.Conv2d(64, 128, 5, padding=2), tnn.BatchNorm2d(128))
                self.adaptation_layers.add_module(f"adapt_layer_{i}", blk)
            self.fc_pose = tnn.Linear(512, 12)

        def forward(self, x, upH, upW):
            mean = torch.tensor([0.485, 0.456, 0.406])
            std = torch.tensor([0.229, 0.224, 0.225])
            x = (x - mean[:, None, None]) / std[:, None, None]
            taps, hyper = [], [2, 14, 28]
            for i, l in enumerate(self.encoder):
                x = l(x)
                if i in hyper:
                    taps.append(x.clone())
            feats = []
            for i, t in enumerate(taps):
                a = getattr(self.adaptation_layers, f"adapt_layer_{i}")(t)
                feats.append(tnn.UpsamplingBilinear2d(size=(upH, upW))(a))
            g = tnn.AdaptiveAvgPool2d(1)(x).reshape(x.shape[0], -1)
            return torch.stack(feats), self.fc_pose(g)

    m = TorchDFNet()
    m.eval()
    # randomize BN running stats so frozen-stats parity is actually tested
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.1)
                mod.running_var.uniform_(0.5, 1.5)
    return m


def test_dfnet_conversion_parity():
    torch.manual_seed(0)
    tm = build_torch_dfnet_replica()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_dfnet(sd)

    x = np.random.default_rng(0).uniform(0, 1, (1, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        tf, tp = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)), 64, 96)

    model = DFNet()
    jf, jp = model.apply(variables, jnp.asarray(x), upsample_hw=(64, 96))
    # features: torch (3, B, C, H, W) vs ours (3, B, H, W, C)
    tf = tf.numpy().transpose(0, 1, 3, 4, 2)
    np.testing.assert_allclose(np.asarray(jf), tf, atol=2e-4)
    np.testing.assert_allclose(np.asarray(jp), tp.numpy(), atol=1e-4)


def test_fusion_net_conversion_parity():
    torch.manual_seed(1)
    tm = tnn.Sequential(
        tnn.Conv2d(19, 64, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(64, 64, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(64, 64, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(64, 16, 5, padding=2), tnn.BatchNorm2d(16))
    tm.eval()
    with torch.no_grad():
        tm[7].running_mean.normal_(0, 0.1)
        tm[7].running_var.uniform_(0.5, 1.5)
    sd = {f"net.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_fusion_net(sd, prefix="")

    x = np.random.default_rng(1).uniform(0, 1, (2, 16, 20, 19)).astype(np.float32)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    xn = x.copy()
    xn[..., :3] = (xn[..., :3] - mean) / std
    with torch.no_grad():
        ty = tm(torch.from_numpy(xn.transpose(0, 3, 1, 2))).numpy()

    model = FusionNet(feature_dim=16)
    jy = model.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(jy), ty.transpose(0, 2, 3, 1),
                               atol=2e-4)


def build_torch_field_replica(transient):
    """Reference NeRFH_NFF tower (nerfh_nff.py:469-505), W=32/D=2 variant."""
    D, W, IN_X, IN_D, OUT = 2, 32, 27, 15, 3 + 8

    class TorchField(tnn.Module):
        def __init__(self):
            super().__init__()
            for i in range(D):
                inp = IN_X if i == 0 else (W + IN_X if i == 1 else W)
                setattr(self, f"xyz_encoding_{i + 1}",
                        tnn.Sequential(tnn.Linear(inp, W), tnn.ReLU(True)))
            self.xyz_encoding_final = tnn.Linear(W, W)
            self.dir_encoding = tnn.Sequential(
                tnn.Linear(W + IN_D, W // 2), tnn.ReLU(True))
            self.static_sigma = tnn.Sequential(tnn.Linear(W, 1), tnn.Softplus())
            self.static_rgb = tnn.Sequential(tnn.Linear(W // 2, OUT))
            if transient:
                self.transient_encoding = tnn.Sequential(
                    tnn.Linear(W + IN_D, W // 2), tnn.ReLU(True),
                    tnn.Linear(W // 2, W // 2), tnn.ReLU(True),
                    tnn.Linear(W // 2, W // 2), tnn.ReLU(True))
                self.transient_sigma = tnn.Sequential(tnn.Linear(W // 2, 1),
                                                      tnn.Softplus())
                self.transient_rgb = tnn.Sequential(tnn.Linear(W // 2, 3),
                                                    tnn.Sigmoid())
                self.transient_beta = tnn.Sequential(tnn.Linear(W // 2, 1),
                                                     tnn.Softplus())

        def forward(self, xyz, d):
            h = xyz
            for i in range(D):
                if i == 1:
                    h = torch.cat([xyz, h], -1)
                h = getattr(self, f"xyz_encoding_{i + 1}")(h)
            sigma = self.static_sigma(h)
            final = self.xyz_encoding_final(h)
            de = self.dir_encoding(torch.cat([final, d], -1))
            rgbfeat = self.static_rgb(de)
            outs = [rgbfeat, sigma]
            if transient:
                te = self.transient_encoding(torch.cat([final, d], -1))
                outs += [self.transient_rgb(te), self.transient_sigma(te),
                         self.transient_beta(te)]
            return outs

    return TorchField()


@pytest.mark.parametrize("transient", [False, True])
def test_field_conversion_parity(transient):
    torch.manual_seed(2)
    tm = build_torch_field_replica(transient)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_nerfh_nff(sd, depth=2, transient=transient)

    model = NeRFHNFF(typ="fine" if transient else "coarse", depth=2,
                     width=32, skips=(1,), in_channels_xyz=27,
                     in_channels_dir=15, feature_dim=8,
                     encode_transient=transient)
    rng = np.random.default_rng(2)
    xyz = rng.standard_normal((6, 27)).astype(np.float32)
    d = rng.standard_normal((6, 15)).astype(np.float32)
    out = model.apply({"params": params}, jnp.asarray(xyz), jnp.asarray(d),
                      output_transient=transient)
    with torch.no_grad():
        touts = tm(torch.from_numpy(xyz), torch.from_numpy(d))
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([out["static_rgb"], out["static_feat"]],
                                   -1)), touts[0].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["static_sigma"]),
                               touts[1].numpy()[:, 0], atol=1e-5)
    if transient:
        np.testing.assert_allclose(np.asarray(out["transient_rgb"]),
                                   touts[2].numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["transient_sigma"]),
                                   touts[3].numpy()[:, 0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["transient_beta"]),
                                   touts[4].numpy()[:, 0], atol=1e-5)


def test_bilinear_align_corners_matches_torch():
    from nefes_tpu.utils.image import resize_bilinear
    x = np.random.default_rng(3).standard_normal((1, 7, 9, 4)).astype(np.float32)
    with torch.no_grad():
        ty = tnn.UpsamplingBilinear2d(size=(20, 30))(
            torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    jy = resize_bilinear(jnp.asarray(x), 20, 30, align_corners=True)
    np.testing.assert_allclose(np.asarray(jy), ty.transpose(0, 2, 3, 1),
                               atol=1e-5)


def test_bicubic_matches_torch():
    from nefes_tpu.utils.image import resize_bicubic
    import torch.nn.functional as F
    x = np.random.default_rng(4).standard_normal((1, 15, 27, 3)).astype(np.float32)
    with torch.no_grad():
        ty = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                           size=(60, 108), mode="bicubic").numpy()
    jy = resize_bicubic(jnp.asarray(x), 60, 108)
    np.testing.assert_allclose(np.asarray(jy), ty.transpose(0, 2, 3, 1),
                               atol=1e-4)


def test_ssim_matches_torch_reference():
    """SSIM vs a transliteration of reference utils.py:15-49."""
    from nefes_tpu.utils.ssim import ssim

    class TorchSSIM(tnn.Module):
        def __init__(self):
            super().__init__()
            k = 7
            self.pool = tnn.AvgPool2d(k, 1)
            self.refl = tnn.ReflectionPad2d(k // 2)
            self.C1, self.C2 = 0.01 ** 2, 0.03 ** 2

        def forward(self, x, y):
            x, y = self.refl(x), self.refl(y)
            mu_x, mu_y = self.pool(x), self.pool(y)
            sx = self.pool(x ** 2) - mu_x ** 2
            sy = self.pool(y ** 2) - mu_y ** 2
            sxy = self.pool(x * y) - mu_x * mu_y
            n = (2 * mu_x * mu_y + self.C1) * (2 * sxy + self.C2)
            d = (mu_x ** 2 + mu_y ** 2 + self.C1) * (sx + sy + self.C2)
            return torch.clamp(n / d, 0, 1)

    rng = np.random.default_rng(5)
    x = rng.uniform(0, 1, (1, 20, 24, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.05, x.shape).astype(np.float32), 0, 1)
    with torch.no_grad():
        ts = TorchSSIM()(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                         torch.from_numpy(y.transpose(0, 3, 1, 2))).numpy()
    js = ssim(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(js), ts.transpose(0, 2, 3, 1),
                               atol=1e-5)
