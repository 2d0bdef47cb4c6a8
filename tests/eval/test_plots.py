"""Figure renderers (reference: training/plot_topic.py, plot_gender.py,
make_pca.py pca_plot, visualize_sim.py) — files render, LaTeX emits."""

import numpy as np
import pytest

from backpacks_flash_attn_tpu.eval import plots


def _png_ok(path):
    import os
    assert os.path.exists(path)
    with open(path, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"
    assert os.path.getsize(path) > 1000


def test_control_frontier(tmp_path):
    curves = {
        "Transformer+PPLM": {"success": [0.068, 0.084, 0.239, 0.303],
                             "quality": [0.95, 0.94, 0.81, 0.62]},
        "Backpack+sense control": {"success": [0.072, 0.121, 0.243, 0.353],
                                   "quality": [0.92, 0.91, 0.90, 0.83]},
    }
    p = plots.plot_control_frontier(curves, str(tmp_path / "frontier.png"))
    _png_ok(p)


def test_next_token_distributions(tmp_path):
    dists = [{" he": 0.37, " the": 0.12, " she": 0.07},
             {" she": 0.18, " he": 0.17, " the": 0.15},
             {" she": 0.25, " the": 0.15, " he": 0.11}]
    p = plots.plot_next_token_distributions(
        dists, str(tmp_path / "gender.png"),
        panel_titles=["scale 0", "scale 0.7", "scale 1"])
    _png_ok(p)


def test_sense_pca_scatter(tmp_path):
    rng = np.random.default_rng(0)
    pca = {"projected": rng.normal(size=(12, 2)),
           "explained": np.asarray([0.4, 0.2])}
    p = plots.plot_sense_pca(pca, str(tmp_path / "pca.png"),
                             labels=[f"w{i}" for i in range(12)],
                             color_by=np.arange(12) % 4)
    _png_ok(p)


def test_similarity_heatmap(tmp_path):
    rng = np.random.default_rng(1)
    v = rng.normal(size=(6, 8))
    n = v / np.linalg.norm(v, axis=-1, keepdims=True)
    p = plots.plot_similarity_heatmap(n @ n.T, str(tmp_path / "sim.png"),
                                      labels=list("abcdef"))
    _png_ok(p)


def test_localization(tmp_path):
    rng = np.random.default_rng(2)
    p = plots.plot_localization(rng.normal(size=(16, 7)),
                                str(tmp_path / "loc.png"),
                                tokens=list("in the city of light".split())
                                + ["<s>", "!"], target=" Paris")
    _png_ok(p)


def test_from_real_model_arrays(tmp_path):
    """End-to-end: arrays from eval/visualize on a tiny model render."""
    import jax
    from backpacks_flash_attn_tpu.config import backpack_test
    from backpacks_flash_attn_tpu.eval import visualize as vz
    from backpacks_flash_attn_tpu.models import backpack as bp

    cfg = backpack_test()
    params = bp.init_backpack(cfg, jax.random.PRNGKey(0))
    words = list(range(5))
    pca = vz.sense_pca(params, cfg, words)
    _png_ok(plots.plot_sense_pca(pca, str(tmp_path / "mpca.png"),
                                 labels=[str(w) for w in words]))
    sim = vz.sense_similarity_matrix(params, cfg, words, sense=0)
    assert np.allclose(np.diag(sim), 1.0, atol=1e-5)
    _png_ok(plots.plot_similarity_heatmap(sim, str(tmp_path / "msim.png")))


def test_latex_table():
    rows = [["GPT-2", 0.244, 0.187], ["Backpack", 0.308, 0.255]]
    tex = plots.latex_table(rows, ["Model", "SimLex", "SimVerb"],
                            caption="Spearman", label="tab:simlex")
    assert r"\begin{tabular}{lll}" in tex
    assert r"\textbf{0.308}" in tex and r"\textbf{0.255}" in tex
    assert "0.244" in tex and r"\textbf{0.244}" not in tex
    assert r"\caption{Spearman}" in tex and r"\label{tab:simlex}" in tex


def test_latex_table_no_bold_for_strings():
    tex = plots.latex_table([["a", "x"], ["b", "y"]], ["c1", "c2"])
    assert r"\textbf" not in tex
