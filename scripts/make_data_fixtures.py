#!/usr/bin/env python
"""Build the checked-in `data/` fixtures from a reference mount (round 4,
VERDICT item 6: the suite + PPL/MCQA/BOSS evals must run with
/root/reference unmounted and no MI_TPU_DATA_DIR).

The fixtures are SUBSETS of the public benchmark corpora the reference
bundles (wikitext-2, PTB, C-Eval, CMMLU, BOSS advqa) — regenerated/truncated
here, not byte-copied: arrows are rewritten row-subset via the datasets
library, CSV/JSON are row-truncated. Full corpora still resolve first from
MI_TPU_DATA_DIR when present (datasets/calibration.py::_search_dirs).

Usage: python scripts/make_data_fixtures.py [--ref /root/reference/mi_optimize/datasets]
"""
import argparse
import csv
import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

ROWS_TEXT = 3000       # wikitext/ptb rows per split (enough for seqlen-2048 crops)
ROWS_CSV = 20          # MCQA rows per subject csv
ROWS_JSON = 64         # BOSS examples per split


def arrow_subset(src_dir, pattern_split, out_path, column, rows):
    from datasets import Dataset

    hits = glob.glob(os.path.join(src_dir, "**", f"*-{pattern_split}.arrow"),
                     recursive=True)
    if not hits:
        print(f"  !! no {pattern_split} arrow under {src_dir}")
        return
    ds = Dataset.from_file(hits[0])
    n = min(rows, len(ds))
    sub = Dataset.from_dict({column: ds[column][:n]})
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    # write a bare .arrow stream the loader's Dataset.from_file understands
    import pyarrow as pa
    import pyarrow.ipc as ipc

    table = sub.data.table if hasattr(sub.data, "table") else sub.data
    with pa.OSFile(out_path, "wb") as sink:
        with ipc.new_stream(sink, table.schema) as w:
            w.write_table(table)
    print(f"  {out_path}: {n} rows")


def synth_ptb_arrow(out_path, split, rows=ROWS_TEXT):
    """Write a synthetic ptb_text_only-shaped arrow: a deterministic
    pseudo-corpus ('sentence' column; lowercase tokens, <unk>, N number
    markers, $ amounts) that exercises the same loader/tokenizer/crop paths
    without redistributing any LDC-licensed Penn Treebank text."""
    import random as _random

    import pyarrow as pa
    import pyarrow.ipc as ipc

    nouns = ("company market share price rate stock bond trader analyst "
             "quarter year earnings report board unit plan group fund index "
             "bank investor product sale cost profit margin contract").split()
    verbs = ("said rose fell closed gained declined reported expects "
             "announced agreed offered posted ended added noted").split()
    mods = ("the a its their this last next new major big small strong "
            "weak recent current").split()
    rng = _random.Random(20260821 if split == "test" else 20260822)

    def sentence():
        n = rng.randint(8, 24)
        toks = []
        for _ in range(n):
            r = rng.random()
            if r < 0.08:
                toks.append("N")
            elif r < 0.12:
                toks.append("<unk>")
            elif r < 0.16:
                toks.append("$ N million")
            elif r < 0.45:
                toks.append(rng.choice(nouns))
            elif r < 0.65:
                toks.append(rng.choice(verbs))
            else:
                toks.append(rng.choice(mods))
        return " ".join(toks)

    table = pa.table({"sentence": [sentence() for _ in range(rows)]})
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with pa.OSFile(out_path, "wb") as sink:
        with ipc.new_stream(sink, table.schema) as w:
            w.write_table(table)
    print(f"  {out_path}: {rows} synthetic rows (no LDC text)")


def csv_subset(src, dst, rows):
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(src, encoding="utf-8") as fi:
        r = list(csv.reader(fi))
    with open(dst, "w", encoding="utf-8", newline="") as fo:
        csv.writer(fo).writerows(r[: rows + 1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference/mi_optimize/datasets")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "data"))
    args = ap.parse_args()
    ref, out = args.ref, os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)

    # --- wikitext: row-subset arrows (CC BY-SA — redistributable) ----------
    for split in ("test", "validation"):
        arrow_subset(os.path.join(ref, "wikitext"), split,
                     os.path.join(out, "wikitext", f"wikitext-{split}.arrow"),
                     "text", ROWS_TEXT)

    # --- ptb: SYNTHETIC stand-in (r4 advisor: Penn Treebank is LDC-licensed;
    # even row subsets are a redistribution risk, so the checked-in fixture
    # carries NO LDC text — a deterministic pseudo-corpus in ptb_text_only's
    # shape/style instead). The real corpus still resolves from
    # MI_TPU_DATA_DIR or the reference mount, which get_ptb prefers.
    for split in ("test", "validation"):
        synth_ptb_arrow(os.path.join(
            out, "ptb_text_only", f"ptb_text_only-{split}.arrow"), split)

    # --- C-Eval: all subjects, val+dev, row-truncated ----------------------
    cat = os.path.join(ref, "ceval-exam", "ceval-exam-category")
    for subj in sorted(os.listdir(cat)):
        for split in ("val", "dev", "test"):
            src = os.path.join(cat, subj, f"{subj}_{split}.csv")
            if os.path.exists(src):
                csv_subset(src, os.path.join(
                    out, "ceval-exam", "ceval-exam-category", subj,
                    f"{subj}_{split}.csv"), ROWS_CSV)
    print(f"  ceval: {len(os.listdir(os.path.join(out, 'ceval-exam', 'ceval-exam-category')))} subjects")

    # --- CMMLU: all subjects, row-truncated (test-source holds the 26
    # subjects absent from test/; the loader reads whichever split is asked)
    for split in ("test", "test-source", "dev", "val"):
        sdir = os.path.join(ref, "cmmlu_v1_0_1", split)
        for f in sorted(os.listdir(sdir)):
            if f.endswith(".csv"):
                csv_subset(os.path.join(sdir, f),
                           os.path.join(out, "cmmlu_v1_0_1", split, f),
                           ROWS_CSV)
    print(f"  cmmlu: {len(os.listdir(os.path.join(out, 'cmmlu_v1_0_1', 'test')))} test csvs")

    # --- BOSS advqa: truncated json ---------------------------------------
    adv = os.path.join(ref, "BOSS", "QuestionAnswering", "advqa")
    for f in ("train.json", "test.json"):
        src = os.path.join(adv, f)
        if not os.path.exists(src):
            continue
        dst = os.path.join(out, "BOSS", "QuestionAnswering", "advqa", f)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        with open(src, encoding="utf-8") as fi:
            lines = fi.readlines()
        # jsonl or a single json array — truncate rows either way
        try:
            first = json.loads(lines[0])
            is_jsonl = True
        except json.JSONDecodeError:
            is_jsonl = False
        with open(dst, "w", encoding="utf-8") as fo:
            if is_jsonl:
                fo.writelines(lines[:ROWS_JSON])
            else:
                data = json.loads("".join(lines))
                json.dump(data[:ROWS_JSON] if isinstance(data, list) else data, fo,
                          ensure_ascii=False)
        print(f"  {dst}")

    print(f"fixtures under {out}")


if __name__ == "__main__":
    main()
