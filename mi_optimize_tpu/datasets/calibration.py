"""Calibration & test data loaders (wikitext2 / PTB / C4 / C-Eval / CMMLU / BOSS).

Protocol parity with the reference loaders
(/root/reference/mi_optimize/datasets/data_loader.py):
  * train split  -> `nsamples` random seqlen crops of the tokenized join
    (wikitext joined with "\n\n", PTB sentences with " "), seeded RNG
  * test split   -> contiguous seqlen chunks
  * get_calibrate_loader dispatches on calibrate_config.name

Offline stance: corpora resolve from MI_TPU_DATA_DIR, ./data, or (data-only)
the read-only reference mount's bundled caches; C4 reads allenai-layout
json.gz shards from MI_TPU_DATA_DIR/c4 and raises a clear error without them.
"""
from __future__ import annotations

import logging
import os
import random
from typing import List, Optional

import numpy as np

from ..quant.config import CalibrationConfig
from .tokenizer import encode_ids

log = logging.getLogger(__name__)

def _search_dirs():
    # MI_TPU_DATA_DIR read per call (not at import) so tests/launchers can set it
    return (
        os.environ.get("MI_TPU_DATA_DIR", ""),
        os.path.join(os.path.dirname(__file__), "..", "..", "data"),
        "/root/reference/mi_optimize/datasets",
    )


def find_data_path(name: str) -> Optional[str]:
    for d in _search_dirs():
        if not d:
            continue
        p = os.path.join(d, name)
        if os.path.exists(p):
            return p
    return None


def _crops(token_ids: np.ndarray, nsamples, seqlen: int, seed: int, split: str):
    """Random train crops / contiguous test chunks of a [1, T] id array."""
    T = token_ids.shape[1]
    if split == "train":
        rng = random.Random(seed)
        out = []
        for _ in range(nsamples):
            i = rng.randint(0, T - seqlen - 1)
            out.append(token_ids[:, i : i + seqlen])
        return out
    n = (T // seqlen) if nsamples == "all" else int(nsamples)
    return [token_ids[:, i * seqlen : (i + 1) * seqlen] for i in range(n)
            if (i + 1) * seqlen <= T or split != "test"]


def _load_arrow_split(corpus_dir: str, split: str):
    """Load a split from a bundled HF builder-cache directory (.arrow files).

    Falls back train -> validation when only eval splits are bundled (the
    reference ships validation/test arrows only); logs the substitution.
    """
    import glob

    from datasets import Dataset

    def find(s):
        hits = glob.glob(os.path.join(corpus_dir, "**", f"*-{s}.arrow"), recursive=True)
        return hits[0] if hits else None

    f = find(split)
    if f is None and split == "train":
        f = find("validation")
        if f is not None:
            log.warning("train split not bundled under %s; using validation for calibration",
                        corpus_dir)
    if f is None:
        raise FileNotFoundError(f"no {split} arrow under {corpus_dir}")
    return Dataset.from_file(f)


def get_wikitext2(tokenizer, split="test", nsamples=128, seqlen=2048, seed=42, **kw):
    path = find_data_path("wikitext")
    if path is None:
        raise FileNotFoundError("wikitext corpus not found; set MI_TPU_DATA_DIR")
    ds = _load_arrow_split(path, split)
    ids = encode_ids(tokenizer, "\n\n".join(ds["text"]))
    return _crops(ids, nsamples, seqlen, seed, split)


def get_ptb(tokenizer, split="test", nsamples=128, seqlen=2048, seed=42, **kw):
    # PTB is LDC-licensed, so the checked-in ./data fixture is a SYNTHETIC
    # stand-in (scripts/make_data_fixtures.py::synth_ptb_arrow) — prefer any
    # REAL corpus (MI_TPU_DATA_DIR, then the reference mount) over it, the
    # reverse of the usual local-first order (r4 advisor finding).
    dirs = list(_search_dirs())
    local = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..",
                                         "data"))
    dirs.sort(key=lambda d: os.path.abspath(d) == local if d else False)
    path = None
    for d in dirs:
        p = os.path.join(d, "ptb_text_only") if d else ""
        if p and os.path.exists(p):
            path = p
            break
    if path is None:
        raise FileNotFoundError("ptb corpus not found; set MI_TPU_DATA_DIR")
    ds = _load_arrow_split(path, split)
    ids = encode_ids(tokenizer, " ".join(ds["sentence"]))
    if split == "test":
        nsamples = ids.shape[1] // seqlen
    return _crops(ids, nsamples, seqlen, seed, split)


def _c4_texts(local: str, split: str) -> List[str]:
    """Texts from local allenai/c4-layout shards (en/c4-<split>-....json.gz or
    a flat dir of .json.gz); the reference streams shard 0 of each split
    (data_loader.py:44,60)."""
    import glob
    import gzip
    import json

    # every pattern names the split — a flat dir must NOT serve the same
    # shard to both train (calibration) and validation (evaluation)
    pats = (os.path.join(local, "en", f"c4-{split}*.json.gz"),
            os.path.join(local, f"c4-{split}*.json.gz"),
            os.path.join(local, f"*{split}*.json.gz"))
    for pat in pats:
        files = sorted(glob.glob(pat))
        if files:
            break
    else:
        raise FileNotFoundError(
            f"no {split} .json.gz shards under {local} (allenai layout: "
            f"en/c4-{split}-....json.gz)")
    texts = []
    with gzip.open(files[0], "rt", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                texts.append(json.loads(line)["text"])
    return texts


def get_c4(tokenizer, split="validation", nsamples=128, seqlen=2048, seed=42, **kw):
    """allenai/c4 semantics (reference data_loader.py:41-69):
    train      -> per-sample: random doc with >= seqlen tokens, random crop
    validation -> join first 1100 docs, contiguous seqlen chunks
    Resolves offline from MI_TPU_DATA_DIR/c4 (json.gz shards, allenai layout).
    """
    local = find_data_path("c4")
    if local is None:
        raise FileNotFoundError(
            "C4 requires a local copy under MI_TPU_DATA_DIR/c4 "
            "(json.gz shards as in allenai/c4)"
        )
    texts = _c4_texts(local, split)
    if split == "train":
        rng = random.Random(seed)
        encs = {}
        out = []
        for _ in range(int(nsamples)):
            while True:
                i = rng.randint(0, len(texts) - 1)
                if i not in encs:
                    encs[i] = encode_ids(tokenizer, texts[i])
                if encs[i].shape[1] > seqlen:
                    break
            j = rng.randint(0, encs[i].shape[1] - seqlen - 1)
            out.append(encs[i][:, j:j + seqlen])
        return out
    if split == "validation":
        ids = encode_ids(tokenizer, " ".join(texts[:1100]))
        if nsamples == "all":
            nsamples = ids.shape[1] // seqlen + 1
        return [ids[:, i * seqlen:(i + 1) * seqlen] for i in range(int(nsamples))
                if i * seqlen < ids.shape[1]]
    raise ValueError(f"unsupported c4 split {split!r}")


def get_test_loader(dataset_name, tokenizer, seqlen=2048, nsamples=128, seed=42, split="test"):
    if dataset_name == "wikitext2":
        return get_wikitext2(tokenizer, split=split, nsamples=nsamples, seqlen=seqlen, seed=seed)
    if dataset_name == "ptb":
        return get_ptb(tokenizer, split=split, nsamples=nsamples, seqlen=seqlen, seed=seed)
    if dataset_name == "c4":
        return get_c4(tokenizer, nsamples=nsamples, seqlen=seqlen, seed=seed)
    raise ValueError(f"unknown dataset {dataset_name!r}")


def get_calibrate_loader(tokenizer, cfg: CalibrationConfig) -> List[np.ndarray]:
    name = cfg.name
    if name == "wikitext2":
        return get_wikitext2(tokenizer, split=cfg.split, nsamples=cfg.nsamples,
                             seqlen=cfg.seqlen, seed=cfg.seed)
    if name == "ptb":
        return get_ptb(tokenizer, split=cfg.split, nsamples=cfg.nsamples,
                       seqlen=cfg.seqlen, seed=cfg.seed)
    if name == "c4":
        return get_c4(tokenizer, split="train", nsamples=cfg.nsamples,
                      seqlen=cfg.seqlen, seed=cfg.seed)
    if name == "ceval":
        from .ceval import get_calibrate_ceval
        return get_calibrate_ceval(tokenizer, subject=cfg.subject, nsamples=cfg.nsamples,
                                   seqlen=cfg.seqlen)
    if name == "cmmlu":
        from .cmmlu import get_calibrate_cmmlu
        return get_calibrate_cmmlu(tokenizer, subject=cfg.subject, nsamples=cfg.nsamples,
                                   seqlen=cfg.seqlen)
    if name == "boss":
        from .boss import get_calibrate_boss
        return get_calibrate_boss(tokenizer, nsamples=cfg.nsamples, seqlen=cfg.seqlen)
    raise ValueError(f"unsupported calibrate name {name!r}")
