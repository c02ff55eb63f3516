"""convert_nefes_checkpoint on a synthesized .tar with the reference's
EXACT key layout (VERDICT r1 item 4 done-criterion): torch Sequential
tower keys, fusion_net.net.{0..7} indices, the tcnn
exposure_embedding.params packed buffer — then the refine CLI driven
end-to-end from that .tar."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.fixture_datasets import make_7scenes_fixture  # noqa: E402


def _lin(rng, n_in, n_out):
    return (torch.tensor(rng.normal(0, 0.1, (n_out, n_in)).astype("float32")),
            torch.tensor(rng.normal(0, 0.1, n_out).astype("float32")))


def build_reference_tar(path, rng, depth=8, width=128, fdim=128):
    """torch.save a dict shaped exactly like run_nefes.py:375-385 writes."""
    def tower(transient):
        sd = {}
        in_ch = 63
        for i in range(1, depth + 1):
            n_in = in_ch if i == 1 else (width + 63 if i == 5 else width)
            w, b = _lin(rng, n_in, width)
            sd[f"xyz_encoding_{i}.0.weight"] = w
            sd[f"xyz_encoding_{i}.0.bias"] = b
        for name, (n_in, n_out) in {
            "xyz_encoding_final": (width, width),
            "dir_encoding.0": (width + 27, width // 2),
            "static_sigma.0": (width, 1),
            "static_rgb.0": (width // 2, 3 + fdim),
        }.items():
            key = name if "." in name else name
            w, b = _lin(rng, n_in, n_out)
            sd[f"{key}.weight"] = w
            sd[f"{key}.bias"] = b
        if transient:
            for j, t in enumerate((0, 2, 4)):
                n_in = width + 27 if j == 0 else width // 2
                w, b = _lin(rng, n_in, width // 2)
                sd[f"transient_encoding.{t}.weight"] = w
                sd[f"transient_encoding.{t}.bias"] = b
            for name, n_out in (("transient_sigma", 1),
                                ("transient_rgb", 3),
                                ("transient_beta", 1)):
                w, b = _lin(rng, width // 2, n_out)
                sd[f"{name}.0.weight"] = w
                sd[f"{name}.0.bias"] = b
        return sd

    coarse = tower(False)
    # fusion_net on the coarse module (nerfh_nff.py:508-509):
    # Sequential convs at net.{0,2,4,6} + BN at net.7
    chans = [(3 + fdim, 64, 3), (64, 64, 3), (64, 64, 3), (64, fdim, 5)]
    for idx, (ci, co, k) in zip((0, 2, 4, 6), chans):
        coarse[f"fusion_net.net.{idx}.weight"] = torch.tensor(
            rng.normal(0, 0.05, (co, ci, k, k)).astype("float32"))
        coarse[f"fusion_net.net.{idx}.bias"] = torch.zeros(co)
    coarse["fusion_net.net.7.weight"] = torch.ones(fdim)
    coarse["fusion_net.net.7.bias"] = torch.zeros(fdim)
    coarse["fusion_net.net.7.running_mean"] = torch.tensor(
        rng.normal(0, 0.1, fdim).astype("float32"))
    coarse["fusion_net.net.7.running_var"] = torch.tensor(
        rng.uniform(0.5, 1.5, fdim).astype("float32"))
    # tcnn exposure MLP packed buffer: 10->32x3->12, widths padded to 16
    n_params = 32 * 16 + 32 * 32 * 2 + 16 * 32
    coarse["exposure_embedding.params"] = torch.tensor(
        rng.normal(0, 0.1, n_params).astype("float32"))

    torch.save({
        "global_step": 600,
        "network_fn_state_dict": coarse,
        "network_fine_state_dict": tower(True),
        "optimizer_state_dict": {},
    }, path)


@pytest.fixture(scope="module")
def tar(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ckpt") / "600.tar")
    build_reference_tar(path, np.random.default_rng(0))
    return path


def test_convert_nefes_checkpoint_structure_and_forward(tar):
    from nefes_tpu.features.convert import convert_nefes_checkpoint
    from nefes_tpu.train import ModelConfig, NeFeSModel

    variables = convert_nefes_checkpoint(tar, depth=8)
    model = NeFeSModel(ModelConfig())
    ref = model.init_variables(jax.random.key(0))
    want = jax.tree.map(lambda x: x.shape, ref["params"])
    got = jax.tree.map(lambda x: np.asarray(x).shape, variables["params"])
    assert want == got
    assert "batch_stats" in variables

    # converted weights drive the full forward: render one ray batch
    from nefes_tpu.render.renderer import render_rays
    rcfg = ModelConfig().render_config(n_samples=4, n_importance=4,
                                       perturb=False).test()
    ro = jnp.zeros((8, 3))
    rd = jnp.concatenate([jnp.zeros((8, 2)), -jnp.ones((8, 1))], axis=1)
    out = render_rays(model.coarse_fn, model.fine_fn, variables["params"],
                      variables["params"], ro, rd, 0.1, 4.0, None, rcfg)
    assert np.all(np.isfinite(np.asarray(out["rgb"])))

    # exposure path: histogram -> affine -> sigmoid in (0, 1)
    rgb = model.apply_exposure(variables["params"], jnp.full((1, 10), 10.0),
                               jnp.zeros((1, 5, 3)))
    assert np.all((np.asarray(rgb) > 0) & (np.asarray(rgb) < 1))


def test_refine_cli_from_reference_tar(tar, tmp_path):
    """The full refinement CLI driven from the synthesized reference
    checkpoint — the ft_path=.tar route users of the reference take."""
    paths = make_7scenes_fixture(str(tmp_path))
    from nefes_tpu.cli.refine import main
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        s = main(["--dataset_type", "7Scenes", "--datadir",
                  paths["datadir"], "--data_root", paths["data_root"],
                  "--df", "8", "--N_samples", "4", "--N_importance", "4",
                  "--pose_only", "3", "--opt_iter", "1", "--tinyscale", "4",
                  "--ft_path", tar, "--refine_batch", "4"])
    finally:
        os.chdir(cwd)
    assert s["n_frames"] == 4
    assert np.isfinite(s["median_t_m"])
