"""torch -> flax converters for the APR-zoo backbones and MsTransformer.

Maps the pretrained torch artifacts the reference loads
(script/dm/direct_pose_model.py:109-173) onto the flax modules in
features/backbones.py / posenet.py / mstransformer.py:

  * torchvision resnet34 / mobilenet_v2 state_dicts
  * efficientnet-pytorch (lukemelas) B0/B3 state_dicts
  * the reference APR heads: PoseNetV2 / EfficientNetB3 / PoseNet_res34 /
    PoseNet(MapNet) (script/dm/pose_model.py:226-333)
  * the official EMSTransPoseNet checkpoint
    (script/mstransformer/transposenet.py; DETR-derived keys)

Conventions: conv OIHW->HWIO, linear (out,in)->(in,out), BN weight/bias ->
scale/bias + running stats into batch_stats. All converters take the
{key: np.ndarray} dicts produced by convert.load_torch_state_dict.
"""

from __future__ import annotations

import numpy as np

from nefes_tpu.features.convert import conv_kernel, dense_kernel


def _bn(sd: dict, key: str):
    params = {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}
    stats = {"mean": sd[f"{key}.running_mean"],
             "var": sd[f"{key}.running_var"]}
    return params, stats


def _conv(sd: dict, key: str, bias: bool = False) -> dict:
    out = {"kernel": conv_kernel(sd[f"{key}.weight"])}
    if bias:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _lin(sd: dict, key: str) -> dict:
    return {"kernel": dense_kernel(sd[f"{key}.weight"]),
            "bias": sd[f"{key}.bias"]}


def _sub(sd: dict, prefix: str) -> dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


# ----------------------------------------------------------------------
# torchvision ResNet-34  (features/backbones.py:ResNet34)
# ----------------------------------------------------------------------

def convert_resnet34(sd: dict) -> tuple[dict, dict]:
    """torchvision resnet34 keys (conv1, bn1, layer{1-4}.{i}.*) ->
    (params, batch_stats) for ResNet34. The torch fc head is ignored
    (replaced per-APR)."""
    params: dict = {"conv1": _conv(sd, "conv1")}
    stats: dict = {}
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")
    for stage, n in enumerate((3, 4, 6, 3)):
        for i in range(n):
            base = f"layer{stage + 1}.{i}"
            name = f"layer{stage + 1}_{i}"
            p = {"conv1": _conv(sd, f"{base}.conv1"),
                 "conv2": _conv(sd, f"{base}.conv2")}
            s = {}
            p["bn1"], s["bn1"] = _bn(sd, f"{base}.bn1")
            p["bn2"], s["bn2"] = _bn(sd, f"{base}.bn2")
            if f"{base}.downsample.0.weight" in sd:
                p["downsample_conv"] = _conv(sd, f"{base}.downsample.0")
                p["downsample_bn"], s["downsample_bn"] = _bn(
                    sd, f"{base}.downsample.1")
            params[name] = p
            stats[name] = s
    return params, stats


def convert_posenet_res34(sd: dict) -> dict:
    """Reference PoseNet_res34 (pose_model.py:263-294): keys
    feature_extractor.* (torchvision resnet34 with fc->2048) + fc_pose."""
    bb = _sub(sd, "feature_extractor.")
    params, stats = convert_resnet34(bb)
    return {"params": {"backbone": params,
                       "fc": _lin(bb, "fc"),
                       "fc_pose": _lin(sd, "fc_pose")},
            "batch_stats": {"backbone": stats}}


def convert_mapnet(sd: dict) -> dict:
    """Reference MapNet(PoseNet) (pose_model.py:297-380): keys
    mapnet.feature_extractor.* + mapnet.{fc_xyz,fc_wpqr} -> flax MapNet
    variables (inner module name 'mapnet')."""
    inner = _sub(sd, "mapnet.") if any(
        k.startswith("mapnet.") for k in sd) else sd
    bb = _sub(inner, "feature_extractor.")
    params, stats = convert_resnet34(bb)
    return {"params": {"mapnet": {"backbone": params,
                                  "fc": _lin(bb, "fc"),
                                  "fc_xyz": _lin(inner, "fc_xyz"),
                                  "fc_wpqr": _lin(inner, "fc_wpqr")}},
            "batch_stats": {"mapnet": {"backbone": stats}}}


# ----------------------------------------------------------------------
# torchvision MobileNetV2  (features/backbones.py:MobileNetV2)
# ----------------------------------------------------------------------

def _convbn(sd: dict, conv_key: str, bn_key: str):
    p = {"conv": _conv(sd, conv_key)}
    bn_p, bn_s = _bn(sd, bn_key)
    p["bn"] = bn_p
    return p, {"bn": bn_s}


def convert_mobilenet_v2(sd: dict) -> tuple[dict, dict]:
    """torchvision mobilenet_v2 'features.*' keys -> (params, batch_stats)
    for MobileNetV2. Block i lives at features.{i+1}; expand-1 blocks have
    the 3-entry conv Sequential, the rest the 4-entry one."""
    params: dict = {}
    stats: dict = {}
    params["stem"], stats["stem"] = _convbn(sd, "features.0.0",
                                            "features.0.1")
    n_blocks = 17
    for b in range(n_blocks):
        base = f"features.{b + 1}.conv"
        p: dict = {}
        s: dict = {}
        if f"{base}.0.0.weight" in sd and f"{base}.1.0.weight" in sd:
            p["expand"], s["expand"] = _convbn(sd, f"{base}.0.0",
                                               f"{base}.0.1")
            p["depthwise"], s["depthwise"] = _convbn(sd, f"{base}.1.0",
                                                     f"{base}.1.1")
            proj_conv, proj_bn = f"{base}.2", f"{base}.3"
        else:  # expand == 1 (first block)
            p["depthwise"], s["depthwise"] = _convbn(sd, f"{base}.0.0",
                                                     f"{base}.0.1")
            proj_conv, proj_bn = f"{base}.1", f"{base}.2"
        proj = {"conv": _conv(sd, proj_conv)}
        bn_p, bn_s = _bn(sd, proj_bn)
        proj["bn"] = bn_p
        p["project"], s["project"] = proj, {"bn": bn_s}
        params[f"block_{b}"] = p
        stats[f"block_{b}"] = s
    params["head"], stats["head"] = _convbn(sd, "features.18.0",
                                            "features.18.1")
    return params, stats


def convert_posenet_v2(sd: dict) -> dict:
    """Reference PoseNetV2 (pose_model.py:247-260): keys
    backbone_net.features.* + fc_pose.*."""
    params, stats = convert_mobilenet_v2(_sub(sd, "backbone_net."))
    return {"params": {"backbone": params, "fc_pose": _lin(sd, "fc_pose")},
            "batch_stats": {"backbone": stats}}


# ----------------------------------------------------------------------
# efficientnet-pytorch (lukemelas) B0/B3  (features/backbones.py)
# ----------------------------------------------------------------------

def convert_efficientnet(sd: dict) -> tuple[dict, dict]:
    """lukemelas EfficientNet keys (_conv_stem, _bn0, _blocks.{i}.*,
    _conv_head, _bn1) -> (params, batch_stats) for EfficientNet."""
    params: dict = {"stem_conv": _conv(sd, "_conv_stem")}
    stats: dict = {}
    params["stem_bn"], stats["stem_bn"] = _bn(sd, "_bn0")
    n_blocks = len({k.split(".")[1] for k in sd if k.startswith("_blocks.")})
    for i in range(n_blocks):
        base = f"_blocks.{i}"
        p: dict = {}
        s: dict = {}
        if f"{base}._expand_conv.weight" in sd:
            p["expand_conv"] = _conv(sd, f"{base}._expand_conv")
            p["bn0"], s["bn0"] = _bn(sd, f"{base}._bn0")
        p["depthwise_conv"] = _conv(sd, f"{base}._depthwise_conv")
        p["bn1"], s["bn1"] = _bn(sd, f"{base}._bn1")
        p["se_reduce"] = _conv(sd, f"{base}._se_reduce", bias=True)
        p["se_expand"] = _conv(sd, f"{base}._se_expand", bias=True)
        p["project_conv"] = _conv(sd, f"{base}._project_conv")
        p["bn2"], s["bn2"] = _bn(sd, f"{base}._bn2")
        params[f"block_{i}"] = p
        stats[f"block_{i}"] = s
    params["head_conv"] = _conv(sd, "_conv_head")
    params["head_bn"], stats["head_bn"] = _bn(sd, "_bn1")
    return params, stats


def convert_efficientnet_b3_apr(sd: dict) -> dict:
    """Reference EfficientNetB3 (pose_model.py:226-244): keys
    backbone_net.* (lukemelas) + fc_pose.*."""
    params, stats = convert_efficientnet(_sub(sd, "backbone_net."))
    return {"params": {"backbone": params, "fc_pose": _lin(sd, "fc_pose")},
            "batch_stats": {"backbone": stats}}


# ----------------------------------------------------------------------
# EMSTransPoseNet official checkpoint  (features/mstransformer.py)
# ----------------------------------------------------------------------

def _mha(sd: dict, key: str, d_model: int, nhead: int) -> dict:
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention
    params ({query,key,value,out})."""
    hd = d_model // nhead
    w = sd[f"{key}.in_proj_weight"]          # (3d, d)
    b = sd[f"{key}.in_proj_bias"]            # (3d,)
    out = {}
    for i, name in enumerate(("query", "key", "value")):
        wi = w[i * d_model:(i + 1) * d_model]          # (d_out, d_in)
        out[name] = {
            "kernel": wi.T.reshape(d_model, nhead, hd),
            "bias": b[i * d_model:(i + 1) * d_model].reshape(nhead, hd),
        }
    wo = sd[f"{key}.out_proj.weight"]        # (d, d) applied x @ wo.T
    out["out"] = {"kernel": wo.T.reshape(nhead, hd, d_model),
                  "bias": sd[f"{key}.out_proj.bias"]}
    return out


def _ln(sd: dict, key: str) -> dict:
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _branch(sd: dict, prefix: str, layers: int, d_model: int,
            nhead: int) -> dict:
    """reference Transformer (transformer.py) -> TransformerBranch params."""
    p: dict = {}
    for i in range(layers):
        b = f"{prefix}.encoder.layers.{i}"
        p[f"enc_{i}"] = {
            "self_attn": {"attn": _mha(sd, f"{b}.self_attn", d_model, nhead)},
            "linear1": _lin(sd, f"{b}.linear1"),
            "linear2": _lin(sd, f"{b}.linear2"),
            "norm1": _ln(sd, f"{b}.norm1"),
            "norm2": _ln(sd, f"{b}.norm2"),
        }
    p["enc_norm"] = _ln(sd, f"{prefix}.encoder.norm")
    for i in range(layers):
        b = f"{prefix}.decoder.layers.{i}"
        p[f"dec_{i}"] = {
            "self_attn": {"attn": _mha(sd, f"{b}.self_attn", d_model, nhead)},
            "cross_attn": {"attn": _mha(sd, f"{b}.multihead_attn", d_model,
                                        nhead)},
            "linear1": _lin(sd, f"{b}.linear1"),
            "linear2": _lin(sd, f"{b}.linear2"),
            "norm1": _ln(sd, f"{b}.norm1"),
            "norm2": _ln(sd, f"{b}.norm2"),
            "norm3": _ln(sd, f"{b}.norm3"),
        }
    p["dec_norm"] = _ln(sd, f"{prefix}.decoder.norm")
    return p


def convert_mstransformer(sd: dict, num_scenes: int = 7, d_model: int = 256,
                          nhead: int = 4, layers: int = 6,
                          single_head: bool = False) -> dict:
    """Official EMSTransPoseNet state_dict -> MSTransPoseNet variables.

    Key groups: backbone.0.body.* (lukemelas B0), backbone.1.{row,col}_embed
    (ONE shared learned pos embedding — copied into both branch embeddings
    here), transformer_{t,rot}.*, input_proj_{t,rot}, query_embed_{t,rot},
    scene_embed, regressor_head_{t,rot}.{s}.{fc_h,fc_o} (stacked into the
    gathered multi-scene head params).
    """
    bb_params, bb_stats = convert_efficientnet(_sub(sd, "backbone.0.body."))
    params: dict = {"backbone": bb_params}

    pos = {"row_embed": sd["backbone.1.row_embed.weight"],
           "col_embed": sd["backbone.1.col_embed.weight"]}
    params["pos_embed_t"] = dict(pos)
    params["pos_embed_rot"] = dict(pos)

    for name in ("t", "rot"):
        params[f"input_proj_{name}"] = _conv(sd, f"input_proj_{name}",
                                             bias=True)
        params[f"query_embed_{name}"] = sd[f"query_embed_{name}.weight"]
        params[f"transformer_{name}"] = _branch(
            sd, f"transformer_{name}", layers, d_model, nhead)

    params["scene_embed"] = _lin(sd, "scene_embed")

    for name, out_dim in (("t", 3), ("rot", 4)):
        if single_head:
            params[f"regressor_head_{name}"] = {
                "fc_h": _lin(sd, f"regressor_head_{name}.fc_h"),
                "fc_o": _lin(sd, f"regressor_head_{name}.fc_o")}
            continue
        wh = np.stack([dense_kernel(
            sd[f"regressor_head_{name}.{s}.fc_h.weight"])
            for s in range(num_scenes)])
        bh = np.stack([sd[f"regressor_head_{name}.{s}.fc_h.bias"]
                       for s in range(num_scenes)])
        wo = np.stack([dense_kernel(
            sd[f"regressor_head_{name}.{s}.fc_o.weight"])
            for s in range(num_scenes)])
        bo = np.stack([sd[f"regressor_head_{name}.{s}.fc_o.bias"]
                       for s in range(num_scenes)])
        params[f"regressor_head_{name}"] = {
            "fc_h_kernel": wh, "fc_h_bias": bh,
            "fc_o_kernel": wo, "fc_o_bias": bo}

    return {"params": params, "batch_stats": {"backbone": bb_stats}}
