"""torch checkpoint -> flax params converters.

The reference's pretrained artifacts (paper_models DFNet/NeFeS ckpts,
torchvision VGG16) are torch state_dicts; this module maps them onto our
flax module trees (SURVEY.md §7 'hard parts': conv OIHW->HWIO, linear
transpose, BN running stats, tcnn packed exposure-MLP buffer).

Everything operates on a {key: np.ndarray} dict — call
``load_torch_state_dict`` to get one from a .pt/.pth/.tar file (requires
the baked-in CPU torch only for deserialisation).
"""

from __future__ import annotations

import numpy as np

# torchvision vgg16.features Conv2d indices -> our layer names
VGG16_TORCH_IDX = {
    0: "conv1_1", 2: "conv1_2", 5: "conv2_1", 7: "conv2_2",
    10: "conv3_1", 12: "conv3_2", 14: "conv3_3",
    17: "conv4_1", 19: "conv4_2", 21: "conv4_3",
    24: "conv5_1", 26: "conv5_2", 28: "conv5_3",
}


def load_torch_state_dict(path: str, prefix: str = "") -> dict[str, np.ndarray]:
    """Load a torch checkpoint into numpy. Accepts raw state_dicts or the
    reference's .tar dicts ({'network_fn_state_dict': ...} etc.)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
        elif isinstance(v, dict):  # nested (e.g. .tar with sub state dicts)
            for kk, vv in v.items():
                if hasattr(vv, "numpy"):
                    out[f"{k}.{kk}"] = vv.detach().cpu().numpy()
    if prefix:
        out = {k[len(prefix):]: v for k, v in out.items()
               if k.startswith(prefix)}
    return out


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def dense_kernel(w: np.ndarray) -> np.ndarray:
    """torch Linear (out, in) -> flax (in, out)."""
    return np.transpose(w)


def _bn(sd: dict, key: str):
    params = {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}
    stats = {"mean": sd[f"{key}.running_mean"],
             "var": sd[f"{key}.running_var"]}
    return params, stats


def convert_dfnet(sd: dict[str, np.ndarray]) -> dict:
    """Reference DFNet state_dict (feature/dfnet.py) -> flax variables for
    nefes_tpu.features.dfnet.DFNet.

    torch keys: encoder.{i}.{weight,bias} (VGG convs),
    adaptation_layers.adapt_layer_{l}.{0,2}.* + .3.* (BN), fc_pose.*.
    """
    params: dict = {}
    stats: dict = {}
    for idx, name in VGG16_TORCH_IDX.items():
        params[name] = {"kernel": conv_kernel(sd[f"encoder.{idx}.weight"]),
                        "bias": sd[f"encoder.{idx}.bias"]}
    for l in range(3):
        base = f"adaptation_layers.adapt_layer_{l}"
        bn_p, bn_s = _bn(sd, f"{base}.3")
        params[f"adapt_{l}"] = {
            "conv1": {"kernel": conv_kernel(sd[f"{base}.0.weight"]),
                      "bias": sd[f"{base}.0.bias"]},
            "conv2": {"kernel": conv_kernel(sd[f"{base}.2.weight"]),
                      "bias": sd[f"{base}.2.bias"]},
            "bn": bn_p,
        }
        stats[f"adapt_{l}"] = {"bn": bn_s}
    if "fc_pose.weight" in sd:
        params["fc_pose"] = {"kernel": dense_kernel(sd["fc_pose.weight"]),
                             "bias": sd["fc_pose.bias"]}
    return {"params": params, "batch_stats": stats}


def convert_fusion_net(sd: dict[str, np.ndarray], prefix: str = "fusion_net.",
                       no_bn: bool = False) -> dict:
    """Reference FusionNet (nerfh_nff.py:356-394; Sequential indices
    net.{0,2,4,6} convs + net.7 BN) -> flax FusionNet variables."""
    g = lambda k: sd[f"{prefix}net.{k}"]
    params = {}
    for i, t in enumerate((0, 2, 4, 6)):
        params[f"conv{i}"] = {"kernel": conv_kernel(g(f"{t}.weight")),
                              "bias": g(f"{t}.bias")}
    out = {"params": params}
    if not no_bn:
        bn_p, bn_s = _bn({k[len(prefix):]: v for k, v in sd.items()
                          if k.startswith(prefix)}, "net.7")
        params["bn"] = bn_p
        out["batch_stats"] = {"bn": bn_s}
    return out


def convert_nerfh_nff(sd: dict[str, np.ndarray], depth: int = 8,
                      transient: bool = False) -> dict:
    """Reference NeRFH_NFF tower state_dict -> flax NeRFHNFF params.

    torch: xyz_encoding_{i}.0.* (Sequential(Linear, ReLU)),
    xyz_encoding_final.*, dir_encoding.0.*, static_sigma.0.*,
    static_rgb.0.*, transient_encoding.{0,2,4}.*, transient_{sigma,rgb,
    beta}.0.* (nerfh_nff.py:469-505).
    """
    lin = lambda k: {"kernel": dense_kernel(sd[f"{k}.weight"]),
                     "bias": sd[f"{k}.bias"]}
    params = {}
    for i in range(1, depth + 1):
        params[f"xyz_encoding_{i}"] = lin(f"xyz_encoding_{i}.0")
    params["xyz_encoding_final"] = lin("xyz_encoding_final")
    params["dir_encoding"] = lin("dir_encoding.0")
    params["static_sigma"] = lin("static_sigma.0")
    params["static_rgb"] = lin("static_rgb.0")
    if transient:
        for j, t in enumerate((0, 2, 4)):
            params[f"transient_encoding_{j + 1}"] = lin(f"transient_encoding.{t}")
        params["transient_sigma"] = lin("transient_sigma.0")
        params["transient_rgb"] = lin("transient_rgb.0")
        params["transient_beta"] = lin("transient_beta.0")
    return params


def convert_exposure_mlp(packed: np.ndarray, n_input: int = 10,
                         n_hidden: int = 32, n_layers: int = 3,
                         n_output: int = 12) -> dict:
    """Unpack a tiny-cuda-nn FullyFusedMLP parameter buffer
    (nerfh_nff.py:512-521) into flax ExposureMLP params.

    tcnn packs row-major per layer with widths padded to 16: layer0
    (hidden x in_pad), hidden layers (hidden x hidden), output
    (out_pad x hidden); no biases (tcnn pads the *input vector* with ones,
    so the padded input columns act as a bias — folded into our bias here).
    """
    in_pad = ((n_input + 15) // 16) * 16
    out_pad = ((n_output + 15) // 16) * 16
    sizes = [n_hidden * in_pad] + [n_hidden * n_hidden] * (n_layers - 1) \
        + [out_pad * n_hidden]
    assert packed.size == sum(sizes), (packed.size, sizes)
    chunks = np.split(packed.astype(np.float32), np.cumsum(sizes)[:-1])

    params = {}
    w0 = chunks[0].reshape(n_hidden, in_pad)
    params["hidden_0"] = {"kernel": w0[:, :n_input].T,
                          "bias": w0[:, n_input:].sum(-1)}
    for i in range(1, n_layers):
        w = chunks[i].reshape(n_hidden, n_hidden)
        params[f"hidden_{i}"] = {"kernel": w.T,
                                 "bias": np.zeros(n_hidden, np.float32)}
    wo = chunks[-1].reshape(out_pad, n_hidden)
    params["out"] = {"kernel": wo[:n_output].T,
                     "bias": np.zeros(n_output, np.float32)}
    return params


def convert_nefes_checkpoint(tar_path: str, depth: int = 8) -> dict:
    """Full reference NeFeS .tar checkpoint -> NeFeSModel variables
    ({'params': {coarse, fine, exposure, fusion}, 'batch_stats': ...})."""
    sd = load_torch_state_dict(tar_path)
    coarse_sd = {k[len("network_fn_state_dict."):]: v for k, v in sd.items()
                 if k.startswith("network_fn_state_dict.")}
    fine_sd = {k[len("network_fine_state_dict."):]: v for k, v in sd.items()
               if k.startswith("network_fine_state_dict.")}
    params = {
        "coarse": convert_nerfh_nff(coarse_sd, depth, transient=False),
        "fine": convert_nerfh_nff(fine_sd, depth, transient=True),
    }
    variables = {"params": params}
    if "network_fn_state_dict.exposure_embedding.params" in sd:
        params["exposure"] = convert_exposure_mlp(
            sd["network_fn_state_dict.exposure_embedding.params"])
    if any(k.startswith("network_fn_state_dict.fusion_net.") for k in sd):
        fused = convert_fusion_net(coarse_sd)
        params["fusion"] = fused["params"]
        if "batch_stats" in fused:
            variables["batch_stats"] = {"fusion": fused["batch_stats"]}
    return variables
