"""CCNet paragraph dedup: first-occurrence keep, normalization, edges."""

from __future__ import annotations

import pandas as pd
import pytest

from log_analysis_spark.operators.dedup import paragraph_dedup


@pytest.fixture(scope="module")
def corpus(spark):
    # "Cookie banner." appears in docs 1, 2, 3; the Copyright line varies
    # in digits/case only (normalizes equal); doc 4 is all-blank lines;
    # doc 5 is empty text.
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5],
                "text": [
                    "Copyright 2021 ACME.\nalpha body one\nCookie banner.",
                    "copyright 2023 acme.\nbeta body two\nCookie banner.",
                    "Cookie banner.\ngamma body three",
                    "\n \n",
                    "",
                ],
            }
        )
    )


def _by_id(df):
    return {r["doc_id"]: r for r in df.collect()}

def test_first_occurrence_survives_rest_drop(spark, corpus):
    out = _by_id(paragraph_dedup(corpus, hash_fn="md5"))
    # doc 1 is the min-(id,pos) winner for both the Copyright group and
    # the Cookie banner group: keeps everything.
    assert out[1]["clean_text"] == (
        "Copyright 2021 ACME.\nalpha body one\nCookie banner."
    )
    assert out[1]["dup_paras"] == 0 and out[1]["n_paras"] == 3
    # doc 2 loses its (normalization-equal) Copyright line AND the banner
    assert out[2]["clean_text"] == "beta body two"
    assert out[2]["dup_paras"] == 2
    # doc 3's banner is at pos 0 but doc 1 won the hash group
    assert out[3]["clean_text"] == "gamma body three"
    assert out[3]["dup_paras"] == 1


def test_normalization_digit_and_case_folding(spark):
    # byte-distinct, normalization-equal: digits->0 plus lowercase plus
    # whitespace collapse; only the first survives.
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [10, 11, 12],
                "text": [
                    "Updated 2024-01-31 12:00",
                    "updated 1999-12-25   23:59",
                    "UPDATED 7-7-7 0:0",
                ],
            }
        )
    )
    out = _by_id(paragraph_dedup(df, hash_fn="md5"))
    assert out[10]["clean_text"] == "Updated 2024-01-31 12:00"
    assert out[11]["clean_text"] == "" and out[11]["dup_paras"] == 1
    assert out[12]["clean_text"] == "" and out[12]["dup_paras"] == 1


def test_blank_paragraphs_drop_and_order_holds(spark, corpus):
    out = _by_id(paragraph_dedup(corpus, hash_fn="md5"))
    assert out[4]["n_paras"] == 0 and out[4]["clean_text"] == ""
    assert out[5]["n_paras"] == 0 and out[5]["clean_text"] == ""
    # survivors re-join in original position order with ORIGINAL bytes
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [20],
                "text": ["Zed Line\n\n  \nApple Line\nMid 42 Line"],
            }
        )
    )
    row = paragraph_dedup(df, hash_fn="md5").collect()[0]
    assert row["clean_text"] == "Zed Line\nApple Line\nMid 42 Line"
    assert row["n_paras"] == 3


def test_max_docs_threshold_and_hash_fn_parity(spark, corpus):
    # max_docs=3: the banner (3 docs) now survives everywhere; the
    # Copyright group (3 docs via normalization) too.
    out = _by_id(paragraph_dedup(corpus, max_docs=3, hash_fn="md5"))
    assert all(r["dup_paras"] == 0 for r in out.values())
    # xxhash64 scale default gives identical verdicts (no collisions here)
    a = sorted(
        (r["doc_id"], r["n_paras"], r["dup_paras"], r["clean_text"])
        for r in paragraph_dedup(corpus, hash_fn="md5").collect()
    )
    b = sorted(
        (r["doc_id"], r["n_paras"], r["dup_paras"], r["clean_text"])
        for r in paragraph_dedup(corpus, hash_fn="xxhash64").collect()
    )
    assert a == b


def test_python_replay_bit_exact(spark):
    """Independent row-by-row replay of the full contract on a corpus
    with every feature at once (ties, normalization folds, blanks)."""
    import hashlib
    import re

    texts = {
        1: "Shared Head\nuniq a1\nTail 99",
        2: "shared   head\nuniq b2\ntail 0",
        3: "Solo doc\nuniq c3",
        4: "Shared Head",
    }
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    paras = []  # (h, doc, pos, original)
    for d, t in texts.items():
        for pos, p in enumerate(t.split("\n")):
            if not p.strip():
                continue
            nrm = re.sub(r"\s+", " ", re.sub(r"[0-9]+", "0", p.lower())).strip()
            h = int(hashlib.md5(nrm.encode()).hexdigest()[:15], 16)
            paras.append((h, d, pos, p))
    winner = {}
    docs_per_hash = {}
    for h, d, pos, _ in paras:
        winner[h] = min(winner.get(h, (d, pos)), (d, pos))
        docs_per_hash.setdefault(h, set()).add(d)
    expected = {}
    for d, t in texts.items():
        kept, n, dup = [], 0, 0
        for pos, p in enumerate(t.split("\n")):
            if not p.strip():
                continue
            n += 1
            nrm = re.sub(r"\s+", " ", re.sub(r"[0-9]+", "0", p.lower())).strip()
            h = int(hashlib.md5(nrm.encode()).hexdigest()[:15], 16)
            if len(docs_per_hash[h]) > 1 and winner[h] != (d, pos):
                dup += 1
            else:
                kept.append(p)
        expected[d] = (n, dup, "\n".join(kept))
    got = {
        r["doc_id"]: (r["n_paras"], r["dup_paras"], r["clean_text"])
        for r in paragraph_dedup(df, hash_fn="md5").collect()
    }
    assert got == expected


# --------------------------------------------------------------------------
# sentence_dedup: the same machinery at sentence granularity
# --------------------------------------------------------------------------


def test_split_sentences_rule(spark):
    """Boundary = [.!?] followed by whitespace (consumed); trailing
    terminal punctuation with no whitespace ends the last sentence;
    'word.. Next' splits after the SECOND dot (the regex needs ws)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from log_analysis_spark.operators.dedup import split_sentences

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "text": [
                    "One two. Three four! Five?  Six",
                    "word.. Next",
                    "No terminal punctuation at all",
                    "Dr. Smith arrived. Fine.",
                ]
            }
        )
    )
    got = [r[0] for r in df.select(split_sentences(F.col("text"))).collect()]
    assert got[0] == ["One two.", "Three four!", "Five?", "Six"]
    assert got[1] == ["word..", "Next"]
    assert got[2] == ["No terminal punctuation at all"]
    # documented cap: no abbreviation lexicon — "Dr." splits
    assert got[3] == ["Dr.", "Smith arrived.", "Fine."]


def test_sentence_dedup_first_occurrence_and_reassembly(spark):
    """The shared sentence survives only in its first (id, pos) slot;
    survivors re-join with single spaces; digit-varying sentences
    normalize into one group; an empty doc yields ('', 0, 0)."""
    import pandas as pd

    from log_analysis_spark.operators.dedup import sentence_dedup

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "Alpha body one. Accept all cookies. Tail one.",
                    "Accept all cookies. Beta body two.",
                    "",
                ],
            }
        )
    )
    out = {
        r["doc_id"]: (r["n_sents"], r["dup_sents"], r["clean_text"])
        for r in sentence_dedup(df).collect()
    }
    assert out[1] == (3, 0, "Alpha body one. Accept all cookies. Tail one.")
    assert out[2] == (2, 1, "Beta body two.")
    assert out[3] == (0, 0, "")


def test_sentence_dedup_digit_normalization_groups(spark):
    """'Copyright 2021 ACME.' and 'copyright 2023 acme.' are ONE hash
    group (lowercase + digits->0): the doc-1 copy survives, doc-2 loses
    its variant."""
    import pandas as pd

    from log_analysis_spark.operators.dedup import sentence_dedup

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [
                    "Copyright 2021 ACME. Own text one.",
                    "copyright 2023 acme. Own text two.",
                ],
            }
        )
    )
    out = {
        r["doc_id"]: (r["dup_sents"], r["clean_text"])
        for r in sentence_dedup(df).collect()
    }
    assert out[1] == (0, "Copyright 2021 ACME. Own text one.")
    assert out[2] == (1, "Own text two.")
