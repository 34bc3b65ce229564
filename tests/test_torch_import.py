"""Golden test: a reference-trained (torch/Lightning) checkpoint loads
into this framework and produces the SAME outputs.

Builds the ACTUAL reference SpSBRDFNeRF with its own torch init, saves a
Lightning-style epoch={n}.ckpt, imports it via --in_ckpts machinery
(utils/torch_import through checkpoint.load_flat), and compares the full
forward (sigma / rgb / RPV heads / analytic normals) point-for-point.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"


def _have_torch() -> bool:
    try:
        import torch  # noqa: F401
        return True
    except ImportError:
        return False


pytestmark = pytest.mark.skipif(
    not (os.path.isdir(REF) and _have_torch()),
    reason="reference repo not mounted or torch unavailable")


@pytest.fixture(scope="module")
def ref_model_and_ckpt(tmp_path_factory):
    from conftest import stub_reference_deps, unstub_reference_deps
    stubbed = stub_reference_deps()
    sys.path.insert(0, REF)
    try:
        import importlib
        import torch
        torch.manual_seed(7)
        spsb = importlib.import_module("models.spsbrdfnerf")
        args = types.SimpleNamespace(
            input_viewdir=False, funcM=True, funcF=True, funcH=1,
            b=False, c=False, theta=False)
        model = spsb.SpSBRDFNeRF(args, layers=4, feat=64, mapping=True,
                                 mapping_sizes=[10, 4], skips=[2],
                                 siren=True, beta=False, roughness=False,
                                 normal="analystic", sun_v="none",
                                 indirect_light=False, dim_RPV=1)
        model.eval()
        # Lightning-style checkpoint exactly as the reference writes it
        # (ModelCheckpoint: state_dict with nerf_coarse.* keys, global_step)
        ckpt_path = str(tmp_path_factory.mktemp("ref_ckpt") / "epoch=9.ckpt")
        torch.save({
            "state_dict": {f"nerf_coarse.{k}": v
                           for k, v in model.state_dict().items()},
            "global_step": 12345,
        }, ckpt_path)
        yield model, ckpt_path
    finally:
        sys.path.remove(REF)
        unstub_reference_deps(stubbed)


def test_reference_ckpt_roundtrip(ref_model_and_ckpt):
    import torch as t
    from brdfnerf_tpu.config import ModelConfig
    from brdfnerf_tpu.models.network import (init_network,
                                             apply_network_with_normals)
    from brdfnerf_tpu.utils import checkpoint as ckpt_mod

    model, ckpt_path = ref_model_and_ckpt
    cfg = ModelConfig(variant="spsbrdf-nerf", siren=True, mapping=True,
                      layers=4, feat=64, skips=(2,), normal="analystic",
                      func_m=True, func_f=True, func_h=1, dim_rpv=1,
                      fast_sin=False)
    template = {"coarse": init_network(jax.random.PRNGKey(0), cfg)}

    # full restore through the same entry point --in_ckpts uses
    params = ckpt_mod.restore_params(template, ckpt_path)
    assert ckpt_mod.checkpoint_step(ckpt_path) == 12345

    xyz = np.random.RandomState(3).uniform(-1, 1, (96, 3)).astype(np.float32)
    ours = apply_network_with_normals(params["coarse"], cfg,
                                      jnp.asarray(xyz), apply_brdf=True)

    xt = t.from_numpy(xyz)
    xt.requires_grad_(True)
    out = model(xt, sigma_only=False, apply_brdf=True,
                nr_an_on=True).detach().numpy()
    # layout: rgb(3) sigma(1) normal_an(3) k(3) theta(3) rhoc(3)
    np.testing.assert_allclose(np.asarray(ours["rgb"]), out[:, 0:3],
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ours["sigma"]), out[:, 3],
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ours["normal_an"]), out[:, 4:7],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ours["rpv_k"]), out[:, 7:10],
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ours["rpv_rhoc"]), out[:, 13:16],
                               rtol=1e-4, atol=2e-5)


def test_handoff_include_from_torch_ckpt(ref_model_and_ckpt):
    """The stage-2 handoff filter (trunk+sigma+feats+rgb) applies to a
    torch checkpoint exactly as to a native .npz (main.py:97-104)."""
    from brdfnerf_tpu.config import ModelConfig
    from brdfnerf_tpu.models.network import init_network
    from brdfnerf_tpu.utils import checkpoint as ckpt_mod

    _, ckpt_path = ref_model_and_ckpt
    cfg = ModelConfig(variant="spsbrdf-nerf", siren=True, mapping=True,
                      layers=4, feat=64, skips=(2,), normal="analystic",
                      func_m=True, func_f=True, func_h=1, dim_rpv=1)
    template = {"coarse": init_network(jax.random.PRNGKey(1), cfg)}
    include = ckpt_mod.handoff_include("coarse", hapke_b=False)
    params = ckpt_mod.restore_params(template, ckpt_path, include=include)

    flat_ck = ckpt_mod.load_flat(ckpt_path)
    flat_new = ckpt_mod._flatten(params)
    # trunk restored from torch...
    k = "coarse/fc_net/0/w"
    np.testing.assert_array_equal(flat_new[k], flat_ck[k])
    # ...but BRDF heads keep the fresh init (not in the include list)
    k2 = "coarse/k_from_xyz/0/w"
    assert not np.array_equal(flat_new[k2], flat_ck[k2])
