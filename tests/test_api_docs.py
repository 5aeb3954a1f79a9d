"""docs/API.md stays in sync with the live public API: regeneration
must reproduce the committed file (run scripts/gen_api_docs.py after
changing any public signature)."""

import os
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_api_docs_in_sync():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import gen_api_docs

    committed = open(os.path.join(REPO, "docs", "API.md")).read()
    assert gen_api_docs.render() == committed, (
        "docs/API.md is stale — run scripts/gen_api_docs.py")


def test_api_docs_cover_key_symbols():
    text = open(os.path.join(REPO, "docs", "API.md")).read()
    for sym in ["DGP", "DGPQuad", "DGPCollapsed", "DGPDamianou",
                "SVGPLayer", "SGPRLayer", "nuts_sample", "hmc_sample",
                "fit_dp", "dp_elbo", "elbo_3d", "with_config",
                "evaluate_regression", "export_predict"]:
        assert f"`{sym}" in text, sym
