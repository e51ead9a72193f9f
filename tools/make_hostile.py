#!/usr/bin/env python
"""Generate a NULL/unicode-hostile variant of a driver corpus
(VERDICT r9 ask #5): same tables, same schema, but the documents table
is rewritten to attack the text/curate/dedup families' weak points —
the H17 ''/'nan' null-convention trap, regex operators, per-code-point
length math, and any hidden assumption that documents are small ASCII —
and the embeddings table is rewritten to attack the ann/semantic
families (null/empty/wrong-dim/zero/NaN/Inf/null-component vectors,
null ids/labels — see mutate_embedding; the validity contract in
similarity.valid_embeddings + _EMB_VALID_SQL must exclude each class
identically in both engines).

    python tools/make_hostile.py [--src /root/testdata/sf0.01]
                                 [--dst .scale/hostile01]

Per-doc mutation is a pure hash of doc_id (corpus is a deterministic
function of src), stratified so every hostile axis hits a fixed share:

* 15%  text = NULL            (n_chars NULL too — the null invariant)
* 8%   text = ''              (empty ≠ null: H17's exact trap)
* 4%   text = whitespace-only ('  \\t\\n  ' — tokenizers must not die)
* 10%  astral/recombinant unicode: emoji (U+1F600+), Gothic
       (U+10348), CJK, Arabic RTL, combining marks, zero-width
       joiners, an embedded BOM — code-point length ≠ byte length ≠
       UTF-16 length, so any engine counting the wrong unit diverges
* 1.5% >1 MB documents made of FEW giant tokens (50 KB each):
       exercises Arrow batch sizing / payload paths without inflating
       token counts (DuckDB oracles are per-doc linear in tokens, but
       a 200k-token doc makes any residual quadratic corner
       intractable — the r10 sweep caught and fixed several)
* 1.5% ~150 KB many-token documents (~25k tokens): exercises window /
       chunk / shingle explosion at a tractable oracle cost
* 4%   lang/source = literal 'nan' or '' (the pandas-artifact
       convention H17 normalizes)
* rest  original text with a 1-in-4 chance of injected '\\r\\n' and
        trailing spaces (line-split operators see foreign newlines)

``n_chars`` is recomputed as CODE-POINT length (NULL for null text) so
the n_chars == length(text) invariant holds in both Spark and DuckDB.
All other tables are copied byte-identical.  Certify with:

    python tools/check_oracle.py --sf .scale/hostile01 \
        --json-out CORRECTNESS_HOSTILE_r10.json
"""

from __future__ import annotations

import argparse
import hashlib
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ASTRAL_SAMPLES = [
    # emoji w/ ZWJ sequence + skin tone modifier (grapheme != codepoint)
    "team: \U0001f469‍\U0001f4bb and \U0001f9d1\U0001f3fd‍\U0001f680 "
    "review \U0001f600\U0001f680\U0001f40d tokens",
    # Gothic (astral alphabetic), CJK, fullwidth digits
    "\U00010348\U00010349 gothic meets 漢字測試 and １２３ wide digits",
    # Arabic RTL + combining marks + BOM embedded mid-string
    "مرحبا rtl text áë combining ﻿ bom inside",
    # mathematical alphanumerics (astral letters regexes often miss)
    "\U0001d518\U0001d52b\U0001d526\U0001d520\U0001d52c\U0001d521\U0001d522 "
    "styled words with plain tail",
    # mixed scripts + zero-width space + non-break space
    "你好 world​ zero width and　ideographic space",
]

BIG_PHRASE = (
    "the quick distributed scan shuffles partitioned batches across "
    "executors while the optimizer prunes columns "
)


def mutate(doc_id: int, text: str | None) -> tuple[str | None, str | None]:
    """(new_text, mutation_tag) — pure function of doc_id."""
    h = int.from_bytes(
        hashlib.md5(f"hostile:{doc_id}".encode()).digest()[:8], "big"
    )
    r = (h % 10_000) / 10_000.0
    if r < 0.15:
        return None, "null"
    if r < 0.23:
        return "", "empty"
    if r < 0.27:
        return "  \t\n  ", "whitespace"
    if r < 0.37:
        s = ASTRAL_SAMPLES[h % len(ASTRAL_SAMPLES)]
        return f"{s} doc{doc_id} {s}", "astral"
    if r < 0.385:
        # >1 MB via ~25 giant tokens of 50 KB each
        giant = ("tok%d" % doc_id) + "x" * 50_000
        return " ".join([giant] * (24 + h % 4)) + f" tail {doc_id}", "huge"
    if r < 0.40:
        reps = 1_500 + (h % 300)  # ~150-180 KB, ~25k tokens
        return BIG_PHRASE * reps + f" unique tail {doc_id}", "manytok"
    if text is not None and h % 4 == 0:
        return text.replace(". ", ".\r\n", 2) + "   ", "crlf"
    return text, "orig"


def mutate_meta(doc_id: int, lang: str | None, source: str | None):
    h = int.from_bytes(
        hashlib.md5(f"hostile-meta:{doc_id}".encode()).digest()[:8], "big"
    )
    r = (h % 10_000) / 10_000.0
    if r < 0.02:
        return "nan", source
    if r < 0.04:
        return lang, ""
    return lang, source


def mutate_embedding(vec_id: int, emb, label):
    """(new_vec_id, new_embedding, new_label, tag) — pure fn of vec_id.

    The garbage classes a 100 TB embedding table actually contains
    (failed encoder batches, model-swap dim changes, fp16 overflow,
    padding rows) — each must be EXCLUDED identically by the engine's
    validity contract (similarity.valid_embeddings) and the oracle's
    _EMB_VALID_SQL, or similarity math diverges (Spark casts NaN to 0
    at quantization; DuckDB errors)."""
    h = int.from_bytes(
        hashlib.md5(f"hostile-emb:{vec_id}".encode()).digest()[:8], "big"
    )
    r = (h % 10_000) / 10_000.0
    e = list(emb)
    if r < 0.04:
        return vec_id, None, label, "null_vec"
    if r < 0.07:
        return vec_id, [], label, "empty"
    if r < 0.10:
        return vec_id, e[:32], label, "wrong_dim"
    if r < 0.13:
        return vec_id, [0.0] * len(e), label, "zero"
    if r < 0.16:
        e[h % len(e)] = float("nan")
        return vec_id, e, label, "nan"
    if r < 0.19:
        e[h % len(e)] = float("inf") if h % 2 else float("-inf")
        return vec_id, e, label, "inf"
    if r < 0.21:
        e[h % len(e)] = None
        return vec_id, e, label, "null_component"
    if r < 0.23:
        return vec_id, e, None, "null_label"
    if r < 0.245:
        return None, e, label, "null_id"
    return vec_id, e, label, "orig"


def mutate_event(event_id: int, row: dict) -> tuple[dict, str]:
    """(new_row, tag) — pure fn of event_id.

    Row-level garbage (null keys/ts, NaN/Inf values) must be EXCLUDED
    by the events validity contract (functions.contracts.valid_events
    + EVENTS_VALID_SQL) identically in both engines — null event-time
    otherwise diverges on ORDERING (Spark nulls-first vs DuckDB
    nulls-last).  Column-level messiness ('nan'/'' event_type,
    malformed/empty/null JSON props, negative values) flows THROUGH
    the contract: operators own those semantics."""
    h = int.from_bytes(
        hashlib.md5(f"hostile-ev:{event_id}".encode()).digest()[:8], "big"
    )
    r = (h % 10_000) / 10_000.0
    out = dict(row)
    if r < 0.03:
        out["event_id"] = None
        return out, "null_id"
    if r < 0.06:
        out["ts"] = None
        return out, "null_ts"
    if r < 0.09:
        out["user_id"] = None
        return out, "null_user"
    if r < 0.11:
        out["value"] = float("nan")
        return out, "nan_value"
    if r < 0.13:
        out["value"] = float("inf") if h % 2 else float("-inf")
        return out, "inf_value"
    if r < 0.16:
        out["value"] = None
        return out, "null_value"
    if r < 0.18:
        out["value"] = -abs(out["value"] or 1.0)
        return out, "neg_value"
    if r < 0.20:
        out["event_type"] = "nan" if h % 2 else ""
        return out, "nan_type"
    if r < 0.22:
        out["props"] = '{"k": 69'  # truncated JSON
        return out, "junk_props"
    if r < 0.24:
        out["props"] = None
        return out, "null_props"
    if r < 0.25:
        out["props"] = ""
        return out, "empty_props"
    return out, "orig"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.01")
    ap.add_argument("--dst", default=".scale/hostile01")
    args = ap.parse_args()

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(args.dst, exist_ok=True)
    for fname in sorted(os.listdir(args.src)):
        if not fname.endswith(".parquet"):
            continue
        src_p = os.path.join(args.src, fname)
        dst_p = os.path.join(args.dst, fname)
        if fname == "events.parquet":
            t = pq.read_table(src_p)
            pdf = t.to_pandas()
            vtags: dict[str, int] = {}
            cols: dict[str, list] = {c: [] for c in pdf.columns}
            for rec in pdf.to_dict("records"):
                nr, tag = mutate_event(int(rec["event_id"]), rec)
                vtags[tag] = vtags.get(tag, 0) + 1
                for c in cols:
                    cols[c].append(nr[c])
            out = pa.table(
                {
                    "event_id": pa.array(
                        [None if v is None else int(v)
                         for v in cols["event_id"]], type=pa.int64()
                    ),
                    "ts": pa.array(
                        [None if v is None or v != v else v
                         for v in cols["ts"]],
                        type=t.schema.field("ts").type,
                    ),
                    "user_id": pa.array(
                        [None if v is None else int(v)
                         for v in cols["user_id"]], type=pa.int64()
                    ),
                    "event_type": pa.array(
                        cols["event_type"], type=pa.string()
                    ),
                    "value": pa.array(cols["value"], type=pa.float64()),
                    "props": pa.array(cols["props"], type=pa.string()),
                }
            )
            pq.write_table(out, dst_p)
            print(f"hostile events: {len(pdf)} rows, {vtags}")
            continue
        if fname == "embeddings.parquet":
            t = pq.read_table(src_p)
            pdf = t.to_pandas()
            etags: dict[str, int] = {}
            ids, vecs, labels = [], [], []
            for vec_id, emb, label in zip(
                pdf["vec_id"], pdf["embedding"], pdf["label"]
            ):
                ni, ne, nl, tag = mutate_embedding(
                    int(vec_id), list(emb), label
                )
                etags[tag] = etags.get(tag, 0) + 1
                ids.append(ni)
                vecs.append(ne)
                labels.append(None if nl is None else int(nl))
            out = pa.table(
                {
                    "vec_id": pa.array(ids, type=pa.int64()),
                    "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
                    "label": pa.array(labels, type=pa.int32()),
                }
            )
            pq.write_table(out, dst_p)
            print(f"hostile embeddings: {len(ids)} rows, {etags}")
            continue
        if fname != "documents.parquet":
            if os.path.isdir(src_p):
                shutil.copytree(src_p, dst_p, dirs_exist_ok=True)
            else:
                shutil.copyfile(src_p, dst_p)
            continue
        t = pq.read_table(src_p)
        pdf = t.to_pandas()
        tags: dict[str, int] = {}
        texts, langs, sources, n_chars = [], [], [], []
        for doc_id, text, lang, source in zip(
            pdf["doc_id"], pdf["text"], pdf["lang"], pdf["source"]
        ):
            nt, tag = mutate(int(doc_id), text)
            tags[tag] = tags.get(tag, 0) + 1
            nl, ns = mutate_meta(int(doc_id), lang, source)
            texts.append(nt)
            langs.append(nl)
            sources.append(ns)
            n_chars.append(None if nt is None else len(nt))
        out = pa.table(
            {
                "doc_id": pa.array(pdf["doc_id"], type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(langs, type=pa.string()),
                "source": pa.array(sources, type=pa.string()),
                "n_chars": pa.array(n_chars, type=pa.int64()),
            }
        )
        pq.write_table(out, dst_p)
        mb = os.path.getsize(dst_p) / 1e6
        print(f"hostile documents: {len(texts)} docs, {mb:.1f} MB, {tags}")
    print(f"wrote {args.dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
