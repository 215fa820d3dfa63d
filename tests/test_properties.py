"""Property-based tests (hypothesis) for parser/writer/diff invariants.

Spark actions per example are expensive, so Spark-backed properties
cap max_examples low; pure-Python parsers get the full default budget.
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data__converter_spark import compare
from data__converter_spark.io import pdf, readers, writers, xlsx_lite

# ---------------------------------------------------------------------------
# F21 page-spec parser — pure python, full example budget
# ---------------------------------------------------------------------------

page_chunk = st.one_of(
    st.integers(1, 99).map(str),
    st.tuples(st.integers(1, 99), st.integers(1, 99)).map(lambda t: f"{t[0]}-{t[1]}"),
    st.sampled_from(["x", "", " ", "a-b", "-", "3-"]),
)


@given(st.lists(page_chunk, max_size=8).map(",".join))
def test_parse_pages_invariants(spec):
    groups = pdf.parse_pages(spec)
    for g in groups:
        assert g, "no empty groups"
        assert g == sorted(g), "ranges normalized ascending"
        assert all(p >= 1 for p in g)
    # idempotence through the canonical rendering
    rendered = ",".join(
        f"{g[0]}-{g[-1]}" if len(g) > 1 else str(g[0]) for g in groups
    )
    assert pdf.parse_pages(rendered) == groups


# ---------------------------------------------------------------------------
# Column-letter round trip (xlsx_lite)
# ---------------------------------------------------------------------------


@given(st.integers(0, 2000))
def test_col_letter_roundtrip(i):
    assert xlsx_lite._col_index(f"{xlsx_lite._col_letter(i)}1") == i


# ---------------------------------------------------------------------------
# Spark-backed properties — few, small examples
# ---------------------------------------------------------------------------

cell = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="\x00\r", exclude_categories=("Cs",)
    ),
    max_size=12,
)
table_rows = st.lists(
    st.tuples(st.integers(0, 50), cell, cell), min_size=1, max_size=6, unique_by=lambda t: t[0]
)

SPARK_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@settings(**SPARK_SETTINGS)
@given(table_rows)
def test_diff_self_is_all_same(spark, rows):
    df = spark.createDataFrame(rows, "k long, x string, y string")
    d = compare.diff(df, df, "k")
    statuses = {r["status"] for r in d.collect()}
    assert statuses <= {"same"}
    assert d.count() == len(rows)


@settings(**SPARK_SETTINGS)
@given(table_rows)
def test_diff_against_empty_is_all_deleted(spark, rows):
    df = spark.createDataFrame(rows, "k long, x string, y string")
    empty = df.limit(0)
    d = compare.diff(df, empty, "k")
    assert {r["status"] for r in d.collect()} == {"deleted"}


@settings(**SPARK_SETTINGS)
@given(st.lists(st.tuples(cell, cell), min_size=1, max_size=5))
def test_csv_roundtrip_arbitrary_cells(spark, tmp_path_factory, rows):
    # embedded commas, quotes, newlines must survive write -> read
    df = spark.createDataFrame(
        [(str(i), a, b) for i, (a, b) in enumerate(rows)], ["id", "a", "b"]
    )
    out = str(tmp_path_factory.mktemp("csvrt") / "t")
    writers.write_csv(df, out)
    back = readers.read_csv(spark, out, multiline=True)
    # reader trims cells (P7) with Java-trim semantics: all control
    # chars <= 0x20 count as whitespace, unlike Python's str.strip
    jtrim = "".join(chr(c) for c in range(0x21))
    want = {str(i): (a.strip(jtrim), b.strip(jtrim)) for i, (a, b) in enumerate(rows)}
    got = {
        r.id: ((r.a or "").strip(jtrim), (r.b or "").strip(jtrim))
        for r in back.collect()
    }
    # null round-trips as empty string at the edge (SURVEY §1.4)
    assert got == {k: (a, b) for k, (a, b) in want.items()}


@settings(**SPARK_SETTINGS)
@given(st.lists(st.tuples(cell, cell), min_size=1, max_size=5))
def test_xlsx_roundtrip_arbitrary_cells(spark, tmp_path_factory, rows):
    df = spark.createDataFrame(
        [(str(i), a, b) for i, (a, b) in enumerate(rows)], ["id", "a", "b"]
    )
    out = str(tmp_path_factory.mktemp("xlrt") / "wb.xlsx")
    writers.write_excel({"s": df}, out)
    back = readers.read_excel(spark, out)["s"]
    got = {r.id: (r.a, r.b) for r in back.collect()}
    assert got == {str(i): (a, b) for i, (a, b) in enumerate(rows)}

doc_text = st.text(
    alphabet=st.sampled_from("ab c"),  # tiny alphabet -> heavy repetition
    min_size=0,
    max_size=60,
)


@settings(**SPARK_SETTINGS)
@given(st.lists(doc_text, min_size=1, max_size=5))
def test_repetition_feature_bounds(spark, texts):
    from data__converter_spark.llmops.textstats import repetition_features

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    for r in repetition_features(df).collect():
        toks = texts[r.doc_id].split()
        assert r.n_words == len(toks)
        if r.dup_word_frac is not None:
            assert 0.0 <= r.dup_word_frac < 1.0
        if r.top_bigram_frac is not None:
            assert 0.0 < r.top_bigram_frac <= 1.0
            # the modal bigram can't be rarer than uniform
            assert r.top_bigram_frac >= 1.0 / max(len(toks) - 1, 1)


@settings(**SPARK_SETTINGS)
@given(st.lists(doc_text, min_size=1, max_size=4))
def test_winnow_is_subset_of_kgram_hashes_and_deterministic(spark, texts):
    from data__converter_spark.llmops.textstats import winnow_fingerprints

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out1 = sorted((r.doc_id, r.fp) for r in winnow_fingerprints(df).collect())
    out2 = sorted((r.doc_id, r.fp) for r in winnow_fingerprints(df).collect())
    assert out1 == out2  # deterministic under re-execution
    # identical docs -> identical fingerprint sets
    dup = spark.createDataFrame(
        [(0, texts[0]), (1, texts[0])], "doc_id long, text string"
    )
    fps = {}
    for r in winnow_fingerprints(dup).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps.get(0, set()) == fps.get(1, set())


@settings(**SPARK_SETTINGS)
@given(st.lists(doc_text, min_size=1, max_size=5), st.integers(8, 64))
def test_pack_sequences_partition_of_corpus(spark, texts, capacity):
    """Packing is a partition of the corpus: every doc lands in exactly
    one bin, offsets are the per-shard running token sums, and a bin id
    is exactly floor(offset / capacity)."""
    from data__converter_spark.llmops.textstats import pack_sequences

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = pack_sequences(df, capacity=capacity, n_shards=2).collect()
    assert sorted(r.doc_id for r in rows) == list(range(len(texts)))
    by_shard: dict = {}
    for r in sorted(rows, key=lambda r: (r.shard, r.doc_id)):
        want_off = by_shard.get(r.shard, 0)
        assert r.tok_offset == want_off
        assert r.bin_id == want_off // capacity
        assert r.n_tokens == len(texts[r.doc_id].split())
        by_shard[r.shard] = want_off + r.n_tokens


@settings(**SPARK_SETTINGS)
@given(st.lists(doc_text.filter(lambda t: t.strip()), min_size=1, max_size=4))
def test_chunk_text_reconstructs_token_stream(spark, texts):
    """Dropping each chunk's overlap prefix and concatenating in
    chunk order reproduces the document's token stream exactly —
    chunking loses nothing and duplicates only the overlap."""
    from data__converter_spark.llmops.textstats import chunk_text

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = chunk_text(df, chunk_tokens=8, overlap=3).collect()
    per_doc: dict = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_id)):
        toks = r.chunk.split(" ") if r.chunk else []
        assert r.n_chunk_tokens == len(toks) <= 8
        prev = per_doc.get(r.doc_id)
        if prev is None:
            per_doc[r.doc_id] = toks
        else:
            assert prev[-3:] == toks[:3]  # overlap is the previous tail
            per_doc[r.doc_id] = prev + toks[3:]
    for doc_id, toks in per_doc.items():
        assert toks == texts[doc_id].split()


@settings(**SPARK_SETTINGS)
@given(st.lists(doc_text, min_size=1, max_size=4))
def test_salient_terms_matches_python_reference(spark, texts):
    """tf/df/rank agree with a direct Counter-based computation under
    arbitrary corpora (ties resolved by (tf desc, df asc, term asc))."""
    from collections import Counter

    from data__converter_spark.llmops.textstats import salient_terms

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r.doc_id, r.rank): (r.term, r.tf, r.df)
        for r in salient_terms(df, k=2, min_len=1).collect()
    }
    tfs = {
        i: Counter(t.lower() for t in txt.split()) for i, txt in enumerate(texts)
    }
    dfreq = Counter(term for c in tfs.values() for term in c)
    for i, c in tfs.items():
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], dfreq[kv[0]], kv[0]))
        for rank, (term, tf) in enumerate(ranked[:2], start=1):
            assert got[(i, rank)] == (term, tf, dfreq[term])
    assert len(got) == sum(min(2, len(c)) for c in tfs.values() if c)


@settings(**SPARK_SETTINGS)
@given(st.lists(doc_text, min_size=1, max_size=5), st.integers(1, 4))
def test_common_token_counts_vs_counter(spark, texts, top_k):
    """Exact agreement with a pure-Python Counter reference, including
    the (count desc, token asc) vocabulary tie-break and empty docs."""
    from collections import Counter

    from data__converter_spark.llmops.textstats import common_token_counts

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_common, r.common_permille)
        for r in common_token_counts(df, top_k=top_k).collect()
    }
    corpus = Counter(t for x in texts for t in x.split())
    vocab = {w for w, _ in sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]}
    for i, x in enumerate(texts):
        toks = x.split()
        n_common = sum(1 for t in toks if t in vocab)
        permille = n_common * 1000 // len(toks) if toks else 0
        assert got[i] == (len(toks), n_common, permille)


@settings(**SPARK_SETTINGS)
@given(
    st.lists(st.tuples(doc_text, st.sampled_from("pqr")), min_size=1, max_size=6),
    st.integers(0, 50),
)
def test_mix_allocation_invariants(spark, rows, budget):
    """Allocation never exceeds availability nor the fair share, and
    sample_permille is the exact floored ratio."""
    from data__converter_spark.llmops.textstats import mix_allocation

    df = spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, source string",
    )
    out = mix_allocation(df, budget_tokens=budget).collect()
    n_sources = len({s for _, s in rows})
    assert len(out) == n_sources
    fair = budget // n_sources
    for r in out:
        avail = sum(len(t.split()) for t, s in rows if s == r.source)
        assert r.avail_tokens == avail
        assert r.alloc_tokens == min(avail, fair)
        assert r.sample_permille == (r.alloc_tokens * 1000 // avail if avail else 0)


@settings(**SPARK_SETTINGS)
@given(st.lists(doc_text, min_size=1, max_size=5))
def test_pmi_collocations_vs_counter(spark, texts):
    """score_milli, counts, and ordering agree with a pure-Python
    Counter reference under arbitrary tiny-alphabet corpora (heavy
    adjacent repetition stresses the min_count prune and ties)."""
    from collections import Counter

    from data__converter_spark.llmops.textstats import pmi_collocations

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = [
        (r.left_tok, r.right_tok, r.pair_cnt, r.left_cnt, r.right_cnt, r.score_milli)
        for r in pmi_collocations(df, min_count=2, top_k=10).collect()
    ]

    uni: Counter = Counter()
    big: Counter = Counter()
    n = 0
    for txt in texts:
        toks = txt.split()
        uni.update(toks)
        n += len(toks)
        big.update(zip(toks, toks[1:]))
    expect = [
        (l, r, c, uni[l], uni[r], (1000 * n * c) // (uni[l] * uni[r]))
        for (l, r), c in big.items()
        if c >= 2
    ]
    expect.sort(key=lambda t: (-t[5], t[0], t[1]))
    assert got == expect[:10]


@settings(**SPARK_SETTINGS)
@given(st.lists(doc_text, min_size=1, max_size=4))
def test_bpe_train_vs_counter(spark, texts):
    """The distributed BPE merge loop agrees merge-for-merge (symbols,
    ranks, exact pair counts, early stop) with a canonical token-list
    Counter reference under arbitrary tiny-alphabet corpora — heavy
    repetition stresses greedy non-overlapping pairing, count ties,
    and the fused-symbol-boundary cases a string replace gets wrong."""
    from collections import Counter

    from data__converter_spark.llmops.textstats import bpe_train
    from data__converter_spark.scale import release_persisted

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_train(df, n_merges=4).collect()
    ]
    release_persisted()

    def merge_word(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    words = Counter(w.lower() for t in texts for w in t.split())
    seqs = [(list(w) + ["</w>"], f) for w, f in words.items()]
    expect = []
    for rank in range(1, 5):
        pc: Counter = Counter()
        for syms, f in seqs:
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (a, b), cnt = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        expect.append((rank, a, b, cnt))
        seqs = [(merge_word(syms, a, b), f) for syms, f in seqs]
    assert got == expect


@settings(**SPARK_SETTINGS)
@given(st.lists(doc_text, min_size=1, max_size=5), st.integers(2, 3))
def test_boilerplate_scrub_vs_counter(spark, texts, min_docs):
    """Scrub output agrees with a pure-Python reference (distinct-doc
    frequency per paragraph, drop every occurrence at the bar) under
    arbitrary tiny-alphabet corpora — 'c' in the alphabet yields
    multi-word docs whose single-space splits act as paragraphs."""
    from collections import Counter

    from data__converter_spark.llmops.dedup import boilerplate_scrub

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["text_scrubbed"], r["n_paras_kept"], r["n_paras_dropped"]
        )
        for r in boilerplate_scrub(df, sep=" ", min_docs=min_docs).collect()
    }

    dfreq: Counter = Counter()
    for _i, t in docs:
        for p in {p for p in t.split(" ") if p.strip()}:
            dfreq[p] += 1
    hot = {p for p, c in dfreq.items() if c >= min_docs}
    for i, t in docs:
        paras = [p for p in t.split(" ") if p.strip()]
        kept = [p for p in paras if p not in hot]
        want = (" ".join(kept), len(kept), len(paras) - len(kept))
        assert got[i] == want, (i, got[i], want)
    assert len(got) == len(docs)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 12),
    st.integers(1, 12),
    st.sampled_from([1, 3, 4]),
    st.integers(0, 4),
    st.integers(0, 2**32 - 1),
)
def test_png_codec_roundtrip_property(h, w, channels, filter_type, seed):
    """encode_png -> _try_decode_png is pixel-exact for every shape,
    channel count, and scanline filter over random pixel data."""
    import numpy as np

    from data__converter_spark.llmops.multimodal import (
        _try_decode_png,
        encode_png,
    )

    rng = np.random.RandomState(seed % (2**31))
    shape = (h, w) if channels == 1 else (h, w, channels)
    px = rng.randint(0, 256, shape, dtype=np.uint8)
    out = _try_decode_png(encode_png(px, filter_type))
    assert out is not None and out.shape == (h, w, 3)
    if channels == 1:
        assert (out == px[:, :, None]).all()  # ALL three channels
    else:
        assert (out == px[:, :, :3]).all()


# ---------------------------------------------------------------------------
# round-8 operators: association pairs, z-order key, histogram drift, RFM
# ---------------------------------------------------------------------------

basket_rows = st.lists(
    st.tuples(st.integers(1, 6), st.integers(1, 5)),  # (basket, item)
    min_size=1,
    max_size=30,
)


@settings(**SPARK_SETTINGS)
@given(basket_rows)
def test_assoc_pairs_bounds(spark, rows):
    """co <= min(cnt_a, cnt_b); directional confidences <= 1000; the
    pair is emitted in canonical (a < b) order exactly once."""
    from data__converter_spark.stats import assoc_pairs

    df = spark.createDataFrame(rows, "bk int, it int")
    out = assoc_pairs(df, "bk", "it", min_pair_count=1).collect()
    seen = set()
    for r in out:
        assert r["item_a"] < r["item_b"]
        key = (r["item_a"], r["item_b"])
        assert key not in seen
        seen.add(key)
        assert r["co"] <= min(r["cnt_a"], r["cnt_b"])
        assert 0 < r["conf_ab_milli"] <= 1000
        assert 0 < r["conf_ba_milli"] <= 1000


@settings(**SPARK_SETTINGS)
@given(basket_rows, st.integers(2, 4))
@pytest.mark.slow
def test_assoc_pairs_cap_is_whole_basket_exclusion(spark, rows, cap):
    """max_basket_size semantics: the capped run equals the uncapped
    run over the PRE-FILTERED basket universe (drop baskets with more
    than `cap` distinct items, recompute everything) — co-counts,
    marginals, confidences and lift all consistent; and a cap at least
    as large as the biggest basket is the identity."""
    from data__converter_spark.stats import assoc_pairs

    df = spark.createDataFrame(rows, "bk int, it int")
    capped = {
        (r["item_a"], r["item_b"]): tuple(r)
        for r in assoc_pairs(
            df, "bk", "it", min_pair_count=1, max_basket_size=cap
        ).collect()
    }
    sizes: dict[int, set] = {}
    for bk, it in rows:
        sizes.setdefault(bk, set()).add(it)
    keep = {bk for bk, items in sizes.items() if len(items) <= cap}
    pre = [(bk, it) for bk, it in rows if bk in keep]
    if pre:
        manual = {
            (r["item_a"], r["item_b"]): tuple(r)
            for r in assoc_pairs(
                spark.createDataFrame(pre, "bk int, it int"),
                "bk", "it", min_pair_count=1,
            ).collect()
        }
    else:
        manual = {}
    assert capped == manual
    big = max(len(v) for v in sizes.values())
    ident = {
        (r["item_a"], r["item_b"]): tuple(r)
        for r in assoc_pairs(
            df, "bk", "it", min_pair_count=1, max_basket_size=max(big, 2)
        ).collect()
    }
    uncapped = {
        (r["item_a"], r["item_b"]): tuple(r)
        for r in assoc_pairs(df, "bk", "it", min_pair_count=1).collect()
    }
    assert ident == uncapped


@settings(**SPARK_SETTINGS)
@given(
    st.lists(st.integers(-50, 250), min_size=1, max_size=20),
    st.integers(1, 3),
)
def test_zorder_key_bijective_on_bins(spark, vals, bits):
    """zorder is a bijection of the per-dim bin tuple: equal bins <=>
    equal key; bins always land inside [0, 2^bits)."""
    from data__converter_spark.scale import zorder_key

    df = spark.createDataFrame([(v, v * 2 % 97) for v in vals], "a long, b long")
    out = zorder_key(
        df, ["a", "b"], {"a": 0, "b": 0}, {"a": 99, "b": 99}, bits_per_dim=bits
    ).collect()
    for r in out:
        assert 0 <= r["bin_a"] < (1 << bits) and 0 <= r["bin_b"] < (1 << bits)
    keys = {(r["bin_a"], r["bin_b"]): r["zorder"] for r in out}
    assert len(set(keys.values())) == len(keys)


@settings(**SPARK_SETTINGS)
@given(
    st.lists(st.integers(0, 99), min_size=1, max_size=25),
    st.lists(st.integers(0, 99), min_size=1, max_size=25),
)
def test_histogram_drift_proportion_invariants(spark, xs, ys):
    """milli proportions sum to <= 1000 per side (floored shares can't
    exceed the whole); every band count is non-negative and TVD milli
    is within [0, 1000]."""
    from data__converter_spark.stats import histogram_drift

    a = spark.createDataFrame([(v,) for v in xs], "v long")
    b = spark.createDataFrame([(v,) for v in ys], "v long")
    rows = histogram_drift(a, b, "v", 25).collect()
    assert sum(r["milli_a"] for r in rows) <= 1000
    assert sum(r["milli_b"] for r in rows) <= 1000
    tvd = sum(r["diff_milli"] for r in rows) // 2
    assert 0 <= tvd <= 1000
    assert sum(r["n_a"] for r in rows) == len(xs)
    assert sum(r["n_b"] for r in rows) == len(ys)


@settings(**SPARK_SETTINGS)
@given(st.integers(2, 12))
def test_rfm_tiles_balanced(spark, n_custs):
    """ntile invariant: tile sizes differ by at most one within a
    group, in every score dimension."""
    import datetime

    from collections import Counter

    from data__converter_spark.stats import rfm_scores

    rows = [
        (c, "g", datetime.date(2024, 1, 1 + c), 10 * c)
        for c in range(1, n_custs + 1)
    ]
    df = spark.createDataFrame(rows, "cust int, grp string, odate date, cents long")
    out = rfm_scores(df, "cust", "grp", "odate", "cents", n_tiles=3).collect()
    for col in ("r_score", "f_score", "m_score"):
        sizes = Counter(r[col] for r in out)
        assert max(sizes.values()) - min(sizes.values()) <= 1


scd2_stream = st.lists(
    st.tuples(
        st.integers(1, 3),                 # key
        st.sampled_from(["a", "b", "c"]),  # state
        st.integers(0, 20),                # day offset (duplicate ts ok)
    ),
    min_size=1,
    max_size=12,
)


@settings(**SPARK_SETTINGS)
@given(scd2_stream, st.integers(0, 21))
def test_scd2_apply_equals_full_rebuild_any_split(spark, rows, split_day):
    """The scd2_apply contract under hypothesis: for ARBITRARY change
    streams (duplicate timestamps, no-op runs, keys born late) and an
    arbitrary timestamp split, apply(scd2(prefix), suffix) ==
    scd2(full). The tiebreak is the row index, so duplicate-ts runs
    exercise the total-order path."""
    import datetime as _dt

    from data__converter_spark.temporal import scd2, scd2_apply

    base = _dt.datetime(2024, 1, 1)
    data = [
        (k, s, base + _dt.timedelta(days=d), i)
        for i, (k, s, d) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "k int, state string, ts timestamp, eid int")
    full = sorted(map(tuple, scd2(df, "k", ["state"], "ts", "eid").collect()))
    cut = base + _dt.timedelta(days=split_day)
    dim = scd2(df.filter(df.ts < cut), "k", ["state"], "ts", "eid")
    got = scd2_apply(
        dim, df.filter(df.ts >= cut), "k", ["state"], "ts", "eid"
    )
    assert sorted(map(tuple, got.collect())) == full


decayed_obs = st.lists(
    st.tuples(
        st.integers(1, 2),        # key
        st.integers(0, 14),       # day offset from epoch
        st.integers(-1000, 1000), # value
    ),
    min_size=1,
    max_size=20,
)


@settings(**SPARK_SETTINGS)
@given(decayed_obs, st.integers(2, 5))
def test_decayed_sum_matches_python_reference(spark, obs, w):
    """decayed_sum == the brute-force definition: for every emitted
    (key, day), Σ over the key's observations within the window of
    v·2^(W-1-d); emitted days are exactly [first obs, last obs] ∩
    {days with a contributor}; nothing past the key's last day."""
    import collections
    import datetime

    from data__converter_spark.temporal import decayed_sum

    epoch = datetime.date(2024, 1, 1)
    rows = [
        (k, (epoch + datetime.timedelta(days=d)).isoformat(), v)
        for k, d, v in obs
    ]
    df = spark.createDataFrame(rows, "k long, day string, v long").withColumn(
        "day", F.col("day").cast("date")
    )
    got = {
        (r["k"], str(r["day"])): r["decayed_scaled"]
        for r in decayed_sum(df, "k", "day", "v", window_days=w).collect()
    }
    # python reference
    daily: dict = collections.defaultdict(int)
    for k, d, v in obs:
        daily[(k, d)] += v
    last = collections.defaultdict(int)
    for (k, d) in daily:
        last[k] = max(last[k], d)
    want: dict = collections.defaultdict(int)
    for (k, d), v in daily.items():
        for off in range(w):
            t = d + off
            if t <= last[k]:
                want[(k, t)] += v * (1 << (w - 1 - off))
    want_m = {
        (k, (epoch + datetime.timedelta(days=t)).isoformat()): s
        for (k, t), s in want.items()
    }
    assert got == want_m


transition_rows = st.lists(
    st.tuples(
        st.integers(1, 3),                    # user
        st.integers(0, 5),                    # ts bucket (ties likely)
        st.sampled_from(["a", "b", "c"]),     # state
    ),
    min_size=2,
    max_size=25,
)


@settings(**SPARK_SETTINGS)
@given(transition_rows)
def test_event_transitions_grid_invariants(spark, obs):
    """Row-normalization invariants: Σn per from_state == from_total
    everywhere; Σ from_total == total steps == Σ(per-user events - 1);
    prob_milli == n*1000 // from_total exactly."""
    import collections

    from data__converter_spark.joins import event_transitions

    rows = [(i + 1, u, float(t), s) for i, (u, t, s) in enumerate(obs)]
    df = spark.createDataFrame(
        rows, "eid long, uid long, tsec double, st string"
    ).withColumn("ts", F.col("tsec").cast("timestamp"))
    out = event_transitions(df, "uid", "ts", "st", tiebreak="eid").collect()
    per_from: dict = collections.defaultdict(int)
    for r in out:
        per_from[r["from_state"]] += r["n"]
        assert r["prob_milli"] == r["n"] * 1000 // r["from_total"]
    for r in out:
        assert per_from[r["from_state"]] == r["from_total"]
    n_users = collections.Counter(u for u, _, _ in obs)
    assert sum(r["n"] for r in out) == sum(c - 1 for c in n_users.values())


file_sizes = st.lists(st.integers(1, 100), min_size=1, max_size=30)


@settings(**SPARK_SETTINGS)
@given(file_sizes, st.integers(10, 200))
def test_compaction_plan_bin_bounds(spark, sizes, target):
    """bin_id == bytes-before div target exactly (so every bin STARTS
    below the target — overflow bounded by its one final file); ids
    start at 0 and are non-decreasing in file order. Ids may legally
    SKIP when one file spans multiple targets — the planner never
    splits a file."""
    from data__converter_spark import scale

    files = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sizes)], "fid long, sz long"
    )
    out = sorted(
        (r["fid"], r["sz"], r["bin_id"])
        for r in scale.compaction_plan(files, "sz", target, "fid").collect()
    )
    before = 0
    prev_bin = 0
    for fid, sz, b in out:
        assert b == before // target
        assert b >= prev_bin
        prev_bin = b
        before += sz
    assert out[0][2] == 0


auc_rows = st.lists(
    st.tuples(st.integers(0, 8), st.booleans()),  # small score range -> ties
    min_size=2,
    max_size=30,
).filter(lambda rs: any(y for _, y in rs) and any(not y for _, y in rs))


@settings(**SPARK_SETTINGS)
@given(auc_rows)
def test_binary_auc_matches_pairwise_reference(spark, rows):
    """binary_auc == the O(P*N) definition: mean over all (pos, neg)
    pairs of [score_pos > score_neg] + 0.5*[tie], floored to micro."""
    from data__converter_spark.stats import binary_auc

    df = spark.createDataFrame(rows, "s long, y boolean")
    r = binary_auc(df, "s", "y").collect()[0]
    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    two_u = sum(2 if p > n else (1 if p == n else 0) for p in pos for n in neg)
    assert (r["n_pos"], r["n_neg"]) == (len(pos), len(neg))
    assert r["auc_micro"] == two_u * 1_000_000 // (2 * len(pos) * len(neg))


dhash_rows = st.lists(
    st.tuples(st.integers(0, 2**32 - 1), st.integers(0, 2**32 - 1)),
    min_size=2,
    max_size=12,
)


@settings(**SPARK_SETTINGS)
@given(dhash_rows)
def test_dhash_candidates_sound_and_pigeonhole_complete(spark, hs):
    """Soundness: every emitted pair shares >= 1 of the four 16-bit
    bands and reports the exact Hamming distance. Completeness
    (pigeonhole): every pair within Hamming distance 3 IS emitted —
    4 bands can't all differ on <= 3 flipped bits."""
    from data__converter_spark.llmops.multimodal import dhash_candidates

    rows = [(i, hi, lo) for i, (hi, lo) in enumerate(hs)]
    df = spark.createDataFrame(rows, "media_id long, dh_hi long, dh_lo long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dhash_candidates(df, max_bucket=100).collect()
    }

    def bands(hi, lo):
        return (hi >> 16, hi & 0xFFFF, lo >> 16, lo & 0xFFFF)

    def ham(a, b):
        return bin((a[0] ^ b[0]) | ((a[1] ^ b[1]) << 32)).count("1")

    for (ia, ib), d in got.items():
        a, b = hs[ia], hs[ib]
        assert d == ham(a, b)
        assert any(x == y for x, y in zip(bands(*a), bands(*b)))
    for ia in range(len(hs)):
        for ib in range(ia + 1, len(hs)):
            if ham(hs[ia], hs[ib]) <= 3:
                assert (ia, ib) in got, f"missed near-pair {ia},{ib}"


# ---------------------------------------------------------------------------
# retractable top-k: unflagged => exact, under arbitrary mixed batches
# ---------------------------------------------------------------------------

topk_script = st.lists(  # per batch: list of (key, value, sign-ish)
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(0, 9),          # tiny value domain -> dup-heavy
            st.booleans(),              # True = try to retract
        ),
        min_size=0,
        max_size=6,
    ),
    min_size=1,
    max_size=3,
)


@settings(**SPARK_SETTINGS)
@given(st.integers(2, 3), topk_script)
@pytest.mark.slow
def test_topk_unflagged_is_always_exact(spark, k, script):
    """Soundness of the two-phase rescan flag against ARBITRARY mixed
    insert/retract batches (including the same-batch refill shape):
    for every key, either the flag is raised or the stored window
    equals the true top-min(k, n) of the surviving multiset.  Only
    retractions of genuinely live rows are issued, so n_rows is the
    ground-truth multiset size throughout."""
    from data__converter_spark.ivm import (
        refresh_topk_with_retractions,
        topk_state,
    )

    base = [("a", 5), ("a", 3), ("b", 7)]
    live = {"a": [5, 3], "b": [7]}
    st_df = topk_state(
        spark.createDataFrame(base, "k string, v long"), ["k"], "v", k
    )
    for batch_spec in script:
        batch = []
        for key, v, retract in batch_spec:
            if retract and v in live[key]:
                live[key].remove(v)
                batch.append((key, v, -1))
            else:
                live[key].append(v)
                batch.append((key, v, 1))
        if not batch:
            continue
        st_df = refresh_topk_with_retractions(
            st_df,
            spark.createDataFrame(batch, "k string, v long, sign long"),
            ["k"],
            "v",
            "sign",
            k,
        )
    got = {
        r["k"]: (list(r["topk"]), r["n_rows"], r["needs_rescan"])
        for r in st_df.collect()
    }
    for key, vals in live.items():
        if not vals:
            assert key not in got
            continue
        topk, n, flag = got[key]
        assert n == len(vals)
        want = sorted(vals, reverse=True)[: min(k, len(vals))]
        assert flag or topk == want, (
            f"key {key}: unflagged window {topk} != true {want}"
        )
