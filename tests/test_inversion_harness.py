"""CI smoke for the BRDF ground-truth inversion harness
(examples/brdf_inversion_check.py): the full pipeline — BRDF-shaded AOI
generation, two-stage training with checkpoint handoff, recovered-map
rendering through serve.load_renderer, and scoring against the
generator's truth — at toy scale.  The recovery CLAIMS live in the
TPU-scale study (BASELINE.md table); this protects the pipeline from
bitrot, not the numbers."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                "..", "examples"))


@pytest.mark.parametrize("family", ["rpv", "hapke"])
def test_inversion_harness_smoke(tmp_path, family):
    from brdf_inversion_check import main as inv_main

    res = inv_main([str(tmp_path), "--size", "48",
                    "--steps1", "60", "--steps2", "60",
                    "--n_train", "2",
                    "--fc_feat", "32", "--fc_layers", "3",
                    "--batch_size", "128",
                    "--n_samples", "6", "--guided_samples", "6",
                    "--normal", "learned", "--nr_spv_lambda", "1.0",
                    "--family", family])

    names = {"rpv": ("k", "theta", "rhoc"),
             "hapke": ("b", "c", "theta")}[family]
    for p in names:
        rec = res["summary"][p]
        assert np.isfinite(rec["recovered_mean"]), (family, p)
        assert np.isfinite(rec["abs_err"])
    assert np.isfinite(res["summary"]["albedo_mae"])
    assert np.isfinite(res["summary"]["normal_mae_deg"])
    assert res["train_view"]["summary"]
    assert res["config"]["family"] == family
    with open(os.path.join(str(tmp_path), "inversion_result.json")) as f:
        assert json.load(f)["summary"]
