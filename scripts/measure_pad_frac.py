"""Measure the padding fraction HF-practice SFT actually computes.

VERDICT r3 #1: the headline `vs_baseline_hf_practice` rested on an ASSUMED
pad_frac=0.44. This script replaces the assumption with a measurement:
tokenize a real instruction dataset and compute the padding fraction under
the batching policies HF users actually run:

  * shuffled_dynamic_bN  — shuffle, batches of N, pad to max-in-batch
    (transformers' default dynamic padding; the configuration of the
    reference's own published Alpaca comparisons)
  * length_grouped_bN    — HF `group_by_length=True`: sample megabatches
    of 50*N, sort by length inside each, then batch (the LengthGroupedSampler
    algorithm) — the best-practice low-padding baseline
  * pad_to_max_2048      — static padding to max_seq_length (the naive
    collator default)

Data: the Alpaca-format instruction dataset shipped as a studio asset in
the reference checkout (257 real instruction/response rows — real length
distribution, not fabricated). Texts are rendered with the standard Alpaca
prompt used by the reference's notebooks, then tokenized with a BPE
tokenizer TRAINED OFFLINE on the corpus (no network). pad_frac is a ratio
of token counts, so it is invariant to proportional tokenizer differences;
the word-count cross-check below verifies that (reported as
`word_count_crosscheck`).

Writes bench_artifacts/pad_frac.json (committed; bench.py reads it) with
per-policy pad fractions, mean/median/p95 lengths, and the cross-check.
"""

import json
import os
import statistics
import sys

DATA_PATHS = [
    os.environ.get("PAD_FRAC_DATA", ""),
    "/root/reference/studio/backend/assets/datasets/alpaca_unsloth.json",
]

ALPACA_PROMPT = (
    "Below is an instruction that describes a task, paired with an input "
    "that provides further context. Write a response that appropriately "
    "completes the request.\n\n"
    "### Instruction:\n{instruction}\n\n"
    "### Input:\n{input}\n\n"
    "### Response:\n{output}")


def load_rows():
    for p in DATA_PATHS:
        if p and os.path.exists(p):
            with open(p) as f:
                rows = json.load(f)
            return p, [ALPACA_PROMPT.format(**r) for r in rows]
    raise SystemExit("no instruction dataset found; set PAD_FRAC_DATA")


def train_bpe(texts, vocab_size=32000):
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size, special_tokens=["<unk>", "<s>", "</s>"])
    tok.train_from_iterator(texts, trainer)
    return tok


def pad_frac_batches(lengths, order, bsz):
    """(pad_frac, mean in-batch max) for batches taken in `order`,
    padded to the in-batch max."""
    real = computed = 0
    maxes = []
    for i in range(0, len(order), bsz):
        chunk = [lengths[j] for j in order[i:i + bsz]]
        real += sum(chunk)
        computed += max(chunk) * len(chunk)
        maxes.append(max(chunk))
    return 1.0 - real / computed, statistics.mean(maxes)


def policy_pad_fracs(lengths, bsz, n_seeds=50):
    import random

    n = len(lengths)
    shuffled, grouped, sh_max, gr_max = [], [], [], []
    for seed in range(n_seeds):
        rng = random.Random(seed)
        order = list(range(n))
        rng.shuffle(order)
        pf, mx = pad_frac_batches(lengths, order, bsz)
        shuffled.append(pf)
        sh_max.append(mx)
        # HF LengthGroupedSampler: megabatches of 50*bsz from the
        # shuffled order, each sorted by length descending
        mega = 50 * bsz
        g = []
        for i in range(0, n, mega):
            g.extend(sorted(order[i:i + mega], key=lambda j: -lengths[j]))
        pf, mx = pad_frac_batches(lengths, g, bsz)
        grouped.append(pf)
        gr_max.append(mx)
    return (statistics.mean(shuffled), statistics.stdev(shuffled),
            statistics.mean(grouped), statistics.stdev(grouped),
            statistics.mean(sh_max), statistics.mean(gr_max))


def main():
    src, texts = load_rows()
    tok = train_bpe(texts)
    lengths = [len(tok.encode(t).ids) + 2 for t in texts]  # +bos/eos
    words = [len(t.split()) + 2 for t in texts]

    out = {
        "source": src,
        "n_examples": len(lengths),
        "tokenizer": "byte-level BPE vocab=32000 trained offline on the corpus",
        "length_stats": {
            "mean": round(statistics.mean(lengths), 1),
            "median": statistics.median(lengths),
            "p95": sorted(lengths)[int(0.95 * len(lengths))],
            "max": max(lengths),
        },
        "policies": {},
    }
    for bsz in (4, 8, 16):
        s_m, s_sd, g_m, g_sd, s_mx, g_mx = policy_pad_fracs(lengths, bsz)
        ws = policy_pad_fracs(words, bsz)
        out["policies"][f"shuffled_dynamic_b{bsz}"] = {
            "pad_frac": round(s_m, 4), "stdev": round(s_sd, 4),
            "mean_batch_max_len": round(s_mx, 1),
            "word_count_crosscheck": round(ws[0], 4)}
        out["policies"][f"length_grouped_b{bsz}"] = {
            "pad_frac": round(g_m, 4), "stdev": round(g_sd, 4),
            "mean_batch_max_len": round(g_mx, 1),
            "word_count_crosscheck": round(ws[2], 4)}
    # static pad to max_seq_length=2048 (truncating longer rows)
    clipped = [min(x, 2048) for x in lengths]
    out["policies"]["pad_to_max_2048"] = {
        "pad_frac": round(1.0 - sum(clipped) / (2048 * len(clipped)), 4)}
    # raw per-example token lengths: lets bench.py CONSTRUCT the
    # dynamic-padded batches and MEASURE the baseline at those shapes
    # instead of scaling by pad_frac
    out["lengths"] = lengths

    os.makedirs("bench_artifacts", exist_ok=True)
    path = os.path.join("bench_artifacts", "pad_frac.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
