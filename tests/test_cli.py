"""End-to-end CLI surfaces (reference workflow: train.py then
metrics/sampling — SURVEY.md §2 rows 1/6).  One tiny synthetic
training run feeds every sample-CLI flag."""

import json
import os

import pytest

from stvd.cli.sample import main as sample_main
from stvd.cli.train import main as train_main


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("clirun"))
    rc = train_main([
        "--preset", "msvd-beam",
        "--set", "model.dim=48", "--set", "model.ctx_dim=32",
        "--set", "model.n_frames=5", "--set", "model.n_words=48",
        "--set", "model.dim_word=24",
        "--set", "data.synthetic_videos=6",
        "--set", "train.batch_size=6", "--set", "train.valid_freq=4",
        "--set", "train.disp_freq=2", "--set", f"train.save_dir={d}",
        "--max-updates", "6",
    ])
    assert rc == 0
    return d


def test_train_cli_artifacts(run_dir):
    for name in ("config.json", "metrics.jsonl", "vocab.pkl", "ckpt",
                 "valid_samples.txt"):
        assert os.path.exists(os.path.join(run_dir, name)), name


def test_train_cli_tracks_test_split(run_dir):
    """The CLI passes the test split into fit(): every valid round also
    scores test, like the reference's train() (SURVEY.md §3.1)."""
    kinds = []
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            kinds.append(json.loads(line)["kind"])
    assert "valid" in kinds and "test" in kinds


def test_train_cli_honors_config_data_parallel(tmp_path):
    """train.data_parallel=true in the config creates the mesh without
    any CLI flag (msvd-dp preset / recipes work as written); shard_map
    likewise falls back to cfg.train.use_shard_map."""
    d = str(tmp_path / "dprun")
    rc = train_main([
        "--preset", "msvd-beam",
        "--set", "model.dim=32", "--set", "model.ctx_dim=16",
        "--set", "model.n_frames=4", "--set", "model.n_words=32",
        "--set", "model.dim_word=16",
        "--set", "data.synthetic_videos=8",
        "--set", "train.data_parallel=true",
        "--set", "train.use_shard_map=true",
        "--set", "train.per_device_batch=1",
        "--set", "train.valid_freq=0", "--set", "train.sample_freq=0",
        "--set", f"train.save_dir={d}",
        "--max-updates", "2",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(d, "metrics.jsonl"))


def test_train_cli_model_parallel(tmp_path):
    """train.model_parallel=2 builds the 2-D (data x model) mesh from
    the config alone: TP-sharded params train through the CLI (dims
    chosen divisible by 2 so TP_RULES actually shard)."""
    d = str(tmp_path / "tprun")
    rc = train_main([
        "--preset", "msvd-beam",
        "--set", "model.dim=32", "--set", "model.ctx_dim=16",
        "--set", "model.n_frames=4", "--set", "model.n_words=32",
        "--set", "model.dim_word=16",
        "--set", "data.synthetic_videos=8",
        "--set", "train.model_parallel=2",
        "--set", "train.batch_size=8",
        "--set", "train.valid_freq=4", "--set", "train.sample_freq=0",
        "--set", "train.disp_freq=2",
        "--set", f"train.save_dir={d}",
        "--max-updates", "4",
    ])
    assert rc == 0
    losses = []
    with open(os.path.join(d, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec["kind"] == "train":
                losses.append(rec["loss"])
    assert losses and all(l == l for l in losses)  # finite, ran


def test_sample_cli_scores(run_dir, capsys):
    assert sample_main(["--run-dir", run_dir, "--split", "valid",
                        "--beam", "2"]) == 0
    out = capsys.readouterr().out
    scores = json.loads(out[out.index("{"):])
    assert "Bleu_4" in scores and "METEOR" in scores
    # scores are persisted as a run artifact (reproducible claims)
    with open(os.path.join(run_dir, "valid_scores.json")) as f:
        saved = json.load(f)
    assert saved["scores"]["Bleu_4"] == scores["Bleu_4"]
    assert saved["beam"] == 2 and saved["split"] == "valid"


def test_sample_cli_nll(run_dir, capsys):
    """--nll reports pred_probs-style NLL + perplexity (SURVEY §3.4)."""
    assert sample_main(["--run-dir", run_dir, "--split", "valid",
                        "--beam", "1", "--nll"]) == 0
    out = capsys.readouterr().out
    scores = json.loads(out[out.index("{"):])
    assert scores["nll"] > 0 and scores["perplexity"] > 1
    assert scores["nll_per_token"] <= scores["nll"]


def test_sample_cli_stochastic_chunked(run_dir, capsys):
    """--stochastic runs the decode_batch-chunked path (chunk smaller
    than the split so at least two chunks + padding execute)."""
    import dataclasses
    import json as _json

    from stvd.config import Config
    cfg_path = os.path.join(run_dir, "config.json")
    with open(cfg_path) as f:
        original = f.read()
    cfg = dataclasses.replace(
        Config.from_json(original),
        decode=dataclasses.replace(
            Config.from_json(original).decode, decode_batch=3))
    try:
        with open(cfg_path, "w") as f:
            f.write(cfg.to_json())
        assert sample_main(["--run-dir", run_dir, "--split", "valid",
                            "--beam", "1", "--stochastic", "2",
                            "--temperature", "0.7"]) == 0
    finally:
        # module-scoped fixture: later tests must see the original
        with open(cfg_path, "w") as f:
            f.write(original)
    with open(os.path.join(run_dir, "valid_sampled.json")) as f:
        rows = _json.load(f)
    # valid split = max(4, videos//4) = 4 -> two chunks at
    # decode_batch=3 (3 + 1 padded)
    assert len(rows) == 4 and len(rows[0]["samples"]) == 2


def test_export_cli_roundtrip_check(run_dir, tmp_path, capsys):
    """cli.export writes the AOT artifact and --check verifies the
    deserialized decoder reproduces the live Captioner (CPU platform
    under the test conftest)."""
    from stvd.cli.export import main as export_main
    out = str(tmp_path / "aot")
    assert export_main(["--run-dir", run_dir, "--out", out,
                        "--platforms", "cpu", "--check"]) == 0
    for name in ("decode_b256.jaxexport", "params.npz", "vocab.pkl",
                 "config.json", "manifest.json"):
        assert os.path.exists(os.path.join(out, name)), name
    stdout = capsys.readouterr().out
    assert "artifact captions match live" in stdout


def test_sample_cli_quant_does_not_overwrite_artifacts(run_dir, capsys):
    """--quant int8 decodes through the W8A8 serving path and prints
    scores, but must NOT overwrite the run dir's committed
    samples/scores artifacts (they belong to the config's own dtype;
    round-5 int8-parity measurements rely on this)."""
    path = os.path.join(run_dir, "valid_scores.json")
    before = open(path).read() if os.path.exists(path) else None
    mtime = os.path.getmtime(path) if before is not None else None
    assert sample_main(["--run-dir", run_dir, "--split", "valid",
                        "--beam", "2", "--quant", "int8"]) == 0
    out = capsys.readouterr().out
    scores = json.loads(out[out.index("{"):])
    assert "Bleu_4" in scores and "METEOR" in scores
    if before is not None:
        assert open(path).read() == before
        assert os.path.getmtime(path) == mtime


def test_sample_cli_quant_suffixes_extra_artifacts(run_dir, capsys):
    """--quant + --nbest writes the n-best artifact under a
    '.{quant}' suffix and leaves the unsuffixed artifact alone."""
    plain = os.path.join(run_dir, "valid_nbest.json")
    # produce (or refresh) the config-dtype artifact first
    assert sample_main(["--run-dir", run_dir, "--split", "valid",
                        "--beam", "2", "--nbest", "2"]) == 0
    before = open(plain).read()
    assert sample_main(["--run-dir", run_dir, "--split", "valid",
                        "--beam", "2", "--nbest", "2",
                        "--quant", "int8"]) == 0
    capsys.readouterr()
    assert open(plain).read() == before
    q = os.path.join(run_dir, "valid_nbest.int8.json")
    assert os.path.exists(q)
    rows = json.load(open(q))
    assert rows and rows[0]["beams"]
