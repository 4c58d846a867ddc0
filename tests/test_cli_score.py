"""Standalone scorer CLI (cli/score) — the reference's cocoeval.py
standalone usage: score a hypothesis file against references with no
model and no accelerator."""

import json
import pickle

import pytest

from stvd.cli.score import load_hypotheses, main
from stvd.metrics.scorer import score_all

REFS = {
    "vid1": ["a man is playing a guitar", "a person plays the guitar"],
    "vid2": ["a cat sits on a mat", "the cat is sitting down"],
    "vid3": ["children are running in a park"],
}
HYPS = {
    "vid1": ["a man is playing a guitar"],
    "vid2": ["a cat sits on the mat"],
    "vid3": ["children run in a park"],
}


@pytest.fixture()
def corpus(tmp_path):
    refs = tmp_path / "refs.json"
    refs.write_text(json.dumps(REFS))
    hyp = tmp_path / "hyp.json"
    hyp.write_text(json.dumps({v: c[0] for v, c in HYPS.items()}))
    return refs, hyp


def test_scores_match_direct_score_all(corpus, capsys):
    refs, hyp = corpus
    assert main(["--hyp", str(hyp), "--refs", str(refs)]) == 0
    got = json.loads(capsys.readouterr().out)
    want = score_all(REFS, HYPS)
    assert got == pytest.approx(want)
    assert "Bleu_4" in got and "METEOR" in got
    assert "ROUGE_L" in got and "CIDEr" in got


def test_samples_json_and_txt_formats(tmp_path):
    rows = [{"image_id": v, "caption": c[0]} for v, c in HYPS.items()]
    sj = tmp_path / "test_samples.json"
    sj.write_text(json.dumps(rows))
    st = tmp_path / "test_samples.txt"
    st.write_text("".join(f"{v}\t{c[0]}\n" for v, c in HYPS.items()))
    want = {v: [c[0]] for v, c in HYPS.items()}
    assert load_hypotheses(str(sj)) == want
    assert load_hypotheses(str(st)) == want
    # dict with list values
    dj = tmp_path / "d.json"
    dj.write_text(json.dumps({v: c for v, c in HYPS.items()}))
    assert load_hypotheses(str(dj)) == want


def test_legacy_cap_pkl_refs(tmp_path, capsys):
    cap = {v: [{"caption": c} for c in caps] for v, caps in REFS.items()}
    p = tmp_path / "CAP.pkl"
    p.write_bytes(pickle.dumps(cap, protocol=2))
    hyp = tmp_path / "hyp.json"
    hyp.write_text(json.dumps({v: c[0] for v, c in HYPS.items()}))
    assert main(["--hyp", str(hyp), "--refs", str(p)]) == 0
    got = json.loads(capsys.readouterr().out)
    assert got == pytest.approx(score_all(REFS, HYPS))


def test_ids_filter_and_intersect(corpus, capsys):
    refs, hyp = corpus
    ids = refs.parent / "split_ids.txt"
    ids.write_text("vid1\nvid2\n")
    assert main(["--hyp", str(hyp), "--refs", str(refs),
                 "--ids", str(ids)]) == 0
    got = json.loads(capsys.readouterr().out)
    sub = {v: REFS[v] for v in ("vid1", "vid2")}
    subh = {v: HYPS[v] for v in ("vid1", "vid2")}
    assert got == pytest.approx(score_all(sub, subh))

    # hypothesis file covering only vid1: error by default, ok with
    # --intersect (COCOScorer semantics vs operator convenience)
    part = refs.parent / "part.json"
    part.write_text(json.dumps({"vid1": HYPS["vid1"][0]}))
    with pytest.raises(ValueError, match="hypotheses missing"):
        main(["--hyp", str(part), "--refs", str(refs)])
    assert main(["--hyp", str(part), "--refs", str(refs),
                 "--intersect"]) == 0
    got = json.loads(capsys.readouterr().out)
    assert got == pytest.approx(
        score_all({"vid1": REFS["vid1"]}, {"vid1": HYPS["vid1"]}))


def test_artifact_embeds_provenance(corpus, capsys):
    refs, hyp = corpus
    (refs.parent / "PROVENANCE.json").write_text(
        json.dumps({"synthetic": True, "generator": "test"}))
    out = refs.parent / "scores.json"
    assert main(["--hyp", str(hyp), "--refs", str(refs),
                 "--out", str(out)]) == 0
    meta = json.loads(out.read_text())
    assert meta["corpus"]["synthetic"] is True
    assert "NOT paper-comparable" in meta["caveat"]
    assert meta["n_videos"] == 3
    assert meta["scores"] == pytest.approx(score_all(REFS, HYPS))
    capsys.readouterr()


def test_unknown_provenance_is_flagged_not_assumed(corpus):
    refs, hyp = corpus
    out = refs.parent / "scores.json"
    assert main(["--hyp", str(hyp), "--refs", str(refs),
                 "--out", str(out)]) == 0
    meta = json.loads(out.read_text())
    assert meta["corpus"]["synthetic"] is None
    assert "caveat" not in meta  # unknown, not asserted synthetic


def test_empty_and_malformed_inputs(tmp_path, corpus):
    refs, hyp = corpus
    bad = tmp_path / "bad.txt"
    bad.write_text("no-tab-here\n")
    with pytest.raises(ValueError, match="vid<TAB>caption"):
        load_hypotheses(str(bad))
    ids = tmp_path / "ids.txt"
    ids.write_text("vidX\n")
    with pytest.raises(ValueError, match="no references"):
        main(["--hyp", str(hyp), "--refs", str(refs), "--ids", str(ids)])
