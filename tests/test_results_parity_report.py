"""write_report unit contract for scripts/results_parity.py: the
generated section is rewritten, the marker-delimited manual appendix is
preserved verbatim across regenerations (the Damianou analyses in
RESULTS.md must survive a re-run)."""

import importlib.util
import os
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "results_parity", os.path.join(REPO, "scripts",
                                       "results_parity.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _payload():
    row = {"loglik": 1.0, "rmse": 0.1, "loglik_early": -0.5,
           "rmse_early": 0.4, "train_seconds": 1.0, "steps_per_sec": 10.0}
    return {"dataset": "synth", "real_data": False, "dtype": "float32",
            "iterations": 100, "early_iter": 10, "M": 8, "minibatch": 16,
            "results": {"SVGP": row, "DGP1": dict(row, loglik=0.9),
                        "DGP2": dict(row, loglik=1.5),
                        "DGP3": dict(row, loglik=1.6),
                        "DGP1_ng": dict(row, loglik=0.9),
                        "DGP2_ng": dict(row, loglik=1.55),
                        "DGP3_ng": dict(row, loglik=1.65),
                        "DGP2_cj": dict(row, loglik=0.2),
                        "DGP2_cj_ng": dict(row, loglik=0.3,
                                           loglik_early=0.25)}}


def test_write_report_preserves_manual_appendix(tmp_path):
    rp = _load()
    out = tmp_path / "RESULTS.md"
    args = types.SimpleNamespace(out=str(out), check=False)

    rp.write_report(args, _payload())
    first = out.read_text()
    assert "## Qualitative checks" in first
    assert rp.APPENDIX_MARKER not in first

    appendix = rp.APPENDIX_MARKER + "\n\n## Hand-written analysis\n\nkeep me.\n"
    out.write_text(first + "\n" + appendix)

    rp.write_report(args, _payload())
    second = out.read_text()
    assert second.count(rp.APPENDIX_MARKER) == 1
    assert "## Hand-written analysis" in second
    assert "keep me." in second
    # regenerated section still precedes the appendix
    assert second.index("## Qualitative checks") \
        < second.index(rp.APPENDIX_MARKER)
