"""Quality-axis ablation battery on the v2 discriminative benchmark.

VERDICT r4 Weak #4: every committed score sat at METEOR 0.72-0.94 on a
template grammar — the quality harness tested plumbing, not modeling.
This battery trains the config ablations the reference paper is about
(reference ``metrics.py:§compute_score`` drives model selection, so
selection must be able to select) on data where the information
placement FORCES separation (stvd/data/synthetic.py
``discriminative_splits``):

  cell                      dataset   expectation
  temporal                  A         cannot name subjects (regions-only)
  spatial                   A         >> temporal on METEOR/BLEU-4
  spatial+ss0.25            A         scheduled-sampling delta
  spatial/greedy            A         beam-5 > greedy (garden-path mix)
  no-motion                 B         cannot name verbs (motion-only)
  motion                    B         >> no-motion

3 train seeds per cell (data seed fixed): the seed column is the noise
floor the deltas are judged against (VERDICT bar: >= 3 ablations move
> 3x seed-to-seed noise).

Usage: python tools/quality_ablations.py [--out runs/quality_v2]
       [--epochs 120] [--seeds 3] [--cells all]
Writes per-cell scores JSON + an ablation table (markdown + JSON).
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from stvd.utils import enable_compile_cache  # noqa: E402


def make_data(which: str, seed: int = 0):
    from stvd.data.synthetic import discriminative_splits
    if which == "A":        # subject only in regions
        return discriminative_splits(
            n_regions=6, region_dim=64, subject_in="regions",
            verb_in="frames", seed=seed)
    if which == "B":        # verb only in motion
        return discriminative_splits(
            n_regions=0, motion_dim=64, subject_in="frames",
            verb_in="motion", seed=seed)
    if which == "C":        # beam-trap reference distribution:
        # clean subject features (no confusable mix — the trap lives
        # in the reference distribution, not the features), generic
        # form in 40% of refs with high-entropy continuations
        return discriminative_splits(
            n_regions=0, subject_in="frames", verb_in="frames",
            confusable=0.0, p_generic=0.4, seed=seed)
    raise ValueError(which)


def make_cfg(spatial: bool, motion: bool, ss_prob: float = 0.0,
             beam: int = 5):
    from stvd.config import Config, DecodeConfig, ModelConfig, TrainConfig
    m = ModelConfig(n_words=96, dim_word=48, dim=128, ctx_dim=128,
                    n_frames=8, compute_dtype="float32",
                    use_dropout=True, dropout_rate=0.3,
                    use_spatial=spatial,
                    n_regions=6 if spatial else 0,
                    region_dim=64 if spatial else 0,
                    use_motion=motion, motion_dim=64 if motion else 0)
    t = TrainConfig(optimizer="adam", lr=2e-3, batch_size=64,
                    clip_c=5.0, maxlen=14, ss_prob=ss_prob)
    d = DecodeConfig(beam_size=beam, maxlen=14, length_norm=0.6,
                     decode_batch=32)
    return Config(model=m, train=t, decode=d)


def train_and_score(cfg, splits, seed: int, epochs: int,
                    nll_stop: float = 0.35):
    import jax
    import jax.numpy as jnp
    from stvd.data.batching import BatchIterator, gather_batch
    from stvd.model.kernel import get_step_fn
    from stvd.train.evaluate import evaluate_split
    from stvd.train.loop import init_train_state, make_train_step

    step_fn = get_step_fn(None)
    state = init_train_state(jax.random.PRNGKey(seed), cfg.model,
                             cfg.train)
    step = make_train_step(cfg.model, cfg.train, step_fn=step_fn)
    dev = splits["train"].bank.to_device()
    it = BatchIterator(splits["train"].captions.n, cfg.train.batch_size,
                       seed=seed)
    m, ep = {}, 0
    t0 = time.time()
    for ep in range(epochs):
        for idx, w in it.epoch():
            b = gather_batch(dev, splits["train"].captions, idx)
            b["weight"] = jnp.asarray(w)
            state, m = step(state, b)
        if float(m["nll_per_token"]) < nll_stop:
            break
    scores = evaluate_split(state["params"], cfg, splits["test"],
                            split="test", step_fn=step_fn)
    scores["train_nll"] = round(float(m["nll_per_token"]), 4)
    scores["epochs"] = ep + 1
    scores["train_s"] = round(time.time() - t0, 1)
    return scores, state["params"]


CELLS = {
    # name: (dataset, cfg kwargs)
    "temporal": ("A", dict(spatial=False, motion=False)),
    "spatial": ("A", dict(spatial=True, motion=False)),
    "spatial_ss25": ("A", dict(spatial=True, motion=False,
                               ss_prob=0.25)),
    "no_motion": ("B", dict(spatial=False, motion=False)),
    "motion": ("B", dict(spatial=False, motion=True)),
    "beamtrap": ("C", dict(spatial=False, motion=False)),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/quality_v2")
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--cells", default="all",
                    help="comma list of cells (default all)")
    args = ap.parse_args()
    enable_compile_cache()
    os.makedirs(args.out, exist_ok=True)

    names = (list(CELLS) if args.cells == "all"
             else args.cells.split(","))
    data = {}
    results = {}
    for name in names:
        dset, kw = CELLS[name]
        if dset not in data:
            data[dset] = make_data(dset)
        cfg = make_cfg(**kw)
        rows = []
        for seed in range(args.seeds):
            scores, params = train_and_score(cfg, data[dset], seed,
                                             args.epochs)
            rows.append(scores)
            print(json.dumps({"cell": name, "seed": seed, **{
                k: (round(v, 4) if isinstance(v, float) else v)
                for k, v in scores.items()}}), flush=True)
            if (name == "spatial" and seed == 0) or name == "beamtrap":
                # decode ablation on the SAME trained weights: beam-5
                # (cell config) vs greedy.  For the beamtrap cell this
                # runs for EVERY seed — paired per-seed deltas remove
                # the training noise from the comparison entirely.
                from stvd.model.kernel import get_step_fn
                from stvd.train.evaluate import evaluate_split
                g_cfg = dataclasses.replace(
                    cfg, decode=dataclasses.replace(cfg.decode,
                                                    beam_size=1))
                g = evaluate_split(params, g_cfg, data[dset]["test"],
                                   split="test",
                                   step_fn=get_step_fn(None))
                results.setdefault(f"{name}_greedy", []).append(g)
                print(json.dumps({"cell": f"{name}_greedy",
                                  "seed": seed,
                                  **{k: round(v, 4) for k, v in
                                     g.items()
                                     if isinstance(v, float)}}),
                      flush=True)
        results[name] = rows

    with open(os.path.join(args.out, "ablation_scores.json"), "w") as f:
        json.dump(results, f, indent=2)

    # table: mean +/- std per metric, deltas vs the seed-noise floor
    import numpy as np
    met = ("Bleu_4", "METEOR", "CIDEr")
    lines = ["| cell | " + " | ".join(met) + " |",
             "|---|" + "---|" * len(met)]
    stats = {}
    for name, rows in results.items():
        cols = []
        for k in met:
            vals = np.array([r[k] for r in rows if k in r], float)
            stats[(name, k)] = (vals.mean(),
                                vals.std() if len(vals) > 1 else 0.0)
            cols.append(f"{vals.mean():.3f}"
                        + (f" ±{vals.std():.3f}" if len(vals) > 1
                           else ""))
        lines.append(f"| {name} | " + " | ".join(cols) + " |")
    noise = max(stats.get(("spatial", "METEOR"), (0, 0))[1], 1e-4)
    pairs = [("spatial", "temporal"), ("motion", "no_motion"),
             ("spatial", "spatial_greedy"),
             ("spatial", "spatial_ss25"),
             ("beamtrap", "beamtrap_greedy")]
    lines.append("")
    lines.append(f"seed-to-seed METEOR noise (spatial): ±{noise:.4f}")
    for a, b in pairs:
        if (a, "METEOR") in stats and (b, "METEOR") in stats:
            d = stats[(a, "METEOR")][0] - stats[(b, "METEOR")][0]
            lines.append(f"- {a} vs {b}: ΔMETEOR {d:+.4f} "
                         f"({abs(d) / noise:.1f}x noise)")
    if ("beamtrap" in results and "beamtrap_greedy" in results
            and len(results["beamtrap"]) == len(
                results["beamtrap_greedy"])):
        # paired per-seed beam-greedy deltas (same trained weights)
        lines.append("")
        for k in met:
            ds = [b[k] - g[k] for b, g in zip(results["beamtrap"],
                                              results["beamtrap_greedy"])]
            ds = np.array(ds)
            lines.append(f"- beamtrap paired beam−greedy {k}: "
                         f"{ds.mean():+.4f} ±{ds.std():.4f} "
                         f"(seeds: {[round(float(x), 4) for x in ds]})")
    table = "\n".join(lines)
    with open(os.path.join(args.out, "ablation_table.md"), "w") as f:
        f.write(table + "\n")
    print(table)


if __name__ == "__main__":
    main()
