"""Tests for the training-data-pipeline operators: planted-duplicate
recall for MinHash-LSH / Jaccard, SimHash locality, and ANN recall vs
the exact brute-force baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from x17a5_spark.queries.dedup import (
    d2_ngram_jaccard,
    d3_minhash_lsh,
    d4_simhash,
)
from x17a5_spark.queries.similarity import s1_cosine_topk, s2_lsh_ann

SF = "/root/testdata/sf0.001"


def test_planted_near_dups_recovered_jaccard(spark):
    out = d2_ngram_jaccard(spark, SF).toPandas()
    pairs = set(zip(out.id_a, out.id_b))
    # every planted (doc, doc+100000) truncation pair with enough tokens
    # must be recovered
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id").collect()
    planted = {(r["doc_id"], r["doc_id"] + 100000) for r in docs}
    recovered = planted & pairs
    assert len(recovered) / len(planted) > 0.9
    assert (out.jaccard >= 0.5).all()


def test_minhash_lsh_agrees_with_exact_jaccard(spark):
    exact = d2_ngram_jaccard(spark, SF).toPandas()
    lsh = d3_minhash_lsh(spark, SF).toPandas()
    exact_pairs = set(zip(exact.id_a, exact.id_b))
    lsh_pairs = set(zip(lsh.id_a, lsh.id_b))
    # LSH candidates are verified with the same threshold, so LSH ⊆ exact;
    # banding (4 bands × 4 rows) should recover the bulk of 0.5+ pairs
    assert lsh_pairs <= exact_pairs
    assert len(lsh_pairs) / max(len(exact_pairs), 1) > 0.5


def test_simhash_locality(spark):
    out = d4_simhash(spark, SF).toPandas()
    assert out.doc_id.nunique() == len(out)
    assert ((out.simhash16 >= 0) & (out.simhash16 < 2**16)).all()


def test_ann_recall_vs_bruteforce(spark):
    exact = s1_cosine_topk(spark, SF).toPandas()
    approx = s2_lsh_ann(spark, SF).toPandas()
    exact_top = {
        q: set(g.sort_values("rank").c_id)
        for q, g in exact.groupby("q_id")
    }
    approx_top = {
        q: set(g.sort_values("rank").c_id) for q, g in approx.groupby("q_id")
    }
    # 8 hyperplanes over 50 vectors: buckets are coarse; require that the
    # ANN path returns *something* for most queries and that returned
    # neighbors are genuinely high-similarity (subset sanity), with
    # aggregate recall above a floor
    hits = total = 0
    for q, top in exact_top.items():
        got = approx_top.get(q, set())
        hits += len(got & top)
        total += len(top)
    assert total > 0
    assert hits / total >= 0.2  # coarse-bucket floor at tiny SF


def test_bruteforce_topk_selfconsistent(spark):
    out = s1_cosine_topk(spark, SF).toPandas()
    # 10 queries × top-5
    assert len(out) == 50
    assert (out.groupby("q_id")["rank"].max() == 5).all()
    # ranks ordered by descending similarity within each query
    for _, g in out.groupby("q_id"):
        sims = list(g.sort_values("rank").cos_sim)
        assert sims == sorted(sims, reverse=True)


def test_s4_pq_adc_matches_numpy_recompute(spark):
    """ADC distances must equal an independent numpy PQ implementation:
    same md5 codebook, same encode argmin, same lut sums."""
    import numpy as np

    from x17a5_spark.queries.similarity import (
        N_QUERIES,
        PQ_K,
        PQ_M,
        PQ_SUB,
        TOP_K,
        _pq_centroid,
        s4_pq_adc,
    )
    from x17a5_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    rows = load_table(spark, sf, "embeddings").select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    cb = np.array(
        [[_pq_centroid(m, j) for j in range(PQ_K)] for m in range(PQ_M)]
    )  # (M, K, SUB)

    def sub_d2(vid):
        v = vecs[vid].reshape(PQ_M, PQ_SUB)
        # (M, K): rounded like both engines
        return np.round(((v[:, None, :] - cb) ** 2).sum(axis=2), 6)

    codes = {}
    for vid in vecs:
        d2 = sub_d2(vid)
        codes[vid] = d2.argmin(axis=1)  # numpy argmin takes lowest j on ties
    expected = {}
    for q in range(N_QUERIES):
        lut = sub_d2(q)
        dists = sorted(
            (round(float(sum(lut[m, codes[c][m]] for m in range(PQ_M))), 6), c)
            for c in vecs
            if c != q
        )
        for rank, (d, c) in enumerate(dists[:TOP_K], 1):
            expected[(q, rank)] = (c, d)

    got = {
        (r["q_id"], r["rank"]): (r["c_id"], round(r["adc_dist"], 6))
        for r in s4_pq_adc(spark, sf).collect()
    }
    assert got == expected


def test_s4_pq_codes_are_compact_and_deterministic(spark):
    """Every vector encodes to exactly M codes in [0, K); two runs agree."""
    from pyspark.sql import functions as F

    from x17a5_spark.queries.similarity import PQ_K, PQ_M, s4_pq_adc

    sf = "/root/testdata/sf0.001"
    a = sorted(map(tuple, s4_pq_adc(spark, sf).collect()))
    b = sorted(map(tuple, s4_pq_adc(spark, sf).collect()))
    assert a == b
    assert 0 < PQ_K <= 16 and PQ_M * 8 == 64


def test_d14_containment_finds_asymmetric_inclusions(spark):
    """D14 contract: planted 40%-token fragments are found contained in
    their originals with containment >= 0.8 — pairs whose JACCARD is
    far below every symmetric query's threshold (the asymmetric case
    d2/d3/d13 structurally miss)."""
    from x17a5_spark.functions.text import tokens as tok_col  # noqa: F401
    from x17a5_spark.queries.dedup import D14_TAU, d14_containment_join
    from x17a5_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    rows = d14_containment_join(spark, sf).collect()
    assert rows, "no containment pairs found at all"
    for r in rows:
        assert D14_TAU <= r["containment"] <= 1.0, r
    planted = [
        r for r in rows
        if r["contained_id"] >= 200000
        and r["container_id"] == r["contained_id"] - 200000
    ]
    assert len(planted) >= 10, f"only {len(planted)} planted fragments recovered"

    # asymmetry: for a planted pair, true shingle Jaccard sits below
    # 0.5 (a 40% prefix fragment) while containment is ~1.0
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf, "documents")
        .filter(F.col("doc_id") == planted[0]["container_id"])
        .collect()
    }
    orig = docs[planted[0]["container_id"]].split()
    frag = orig[: max(len(orig) * 2 // 5, 1)]

    def shingles(t):
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    s_o, s_f = shingles(orig), shingles(frag)
    jac = len(s_o & s_f) / len(s_o | s_f)
    cont = len(s_o & s_f) / len(s_f)
    assert jac < 0.5, jac
    assert cont >= D14_TAU, cont


def test_d15_paragraph_dedup_strips_boilerplate_keeps_originals(spark):
    """D15 contract, checked against a pure-Python replay of the same
    semantics: originals keep every paragraph (no false positives on
    >=5-token windows of random text), the planted boilerplate survives
    exactly once corpus-wide, and each copy is stripped down to at most
    the boilerplate keeper plus an always-kept short ragged tail."""
    from x17a5_spark.queries.dedup import (
        D15_BOILERPLATE,
        D15_MIN_TOKENS,
        D15_PARA_TOKENS,
        d15_paragraph_dedup,
    )
    from x17a5_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    out = {r["doc_id"]: r for r in d15_paragraph_dedup(spark, sf).collect()}
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf, "documents").collect()
    }

    # pure-Python replay
    aug = dict(docs)
    for did, text in docs.items():
        if did % 10 == 0:
            aug[did + 300000] = D15_BOILERPLATE + " " + text
    paras = []  # (doc_id, pos, para, para_len)
    for did in aug:
        toks = aug[did].split()
        for pos in range(0, (len(toks) + D15_PARA_TOKENS - 1) // D15_PARA_TOKENS):
            seg = toks[pos * D15_PARA_TOKENS : (pos + 1) * D15_PARA_TOKENS]
            paras.append((did, pos, " ".join(seg), len(seg)))
    first = {}
    for did, pos, para, plen in sorted(paras):
        if plen >= D15_MIN_TOKENS and para not in first:
            first[para] = (did, pos)
    expected = {}
    for did in aug:
        kept = [
            (pos, para)
            for (d, pos, para, plen) in paras
            if d == did
            and (plen < D15_MIN_TOKENS or first.get(para) == (did, pos))
        ]
        kept.sort()
        expected[did] = (len(kept), " ".join(p for _, p in kept))

    assert set(out) == set(aug)
    for did, (n_kept, text_dedup) in expected.items():
        assert out[did]["n_kept"] == n_kept, (did, out[did], n_kept)
        assert out[did]["text_dedup"] == text_dedup, did

    # structural claims the replay should itself exhibit:
    # 1. most originals are fully intact — the ONLY originals allowed
    # to lose a paragraph are those whose text duplicates an earlier
    # doc's (the corpus plants whole-doc duplicates by construction)
    intact = [d for d in docs if out[d]["text_dedup"] == docs[d]]
    assert len(intact) >= len(docs) // 2, (len(intact), len(docs))
    for did in sorted(docs):
        if out[did]["text_dedup"] != docs[did]:
            dup_paras = {
                para
                for (d, _pos, para, plen) in paras
                if d == did and plen >= D15_MIN_TOKENS and first[para][0] != did
            }
            assert dup_paras, f"original {did} shrank with no duplicated paragraph"
    # 2. boilerplate survives exactly once corpus-wide
    n_boiler = sum(
        1 for did in aug if D15_BOILERPLATE in out[did]["text_dedup"]
    )
    assert n_boiler == 1, n_boiler
    # 3. copies are stripped to at most keeper + short tail
    copies = [did for did in aug if did >= 300000]
    assert copies
    for did in copies:
        assert out[did]["n_kept"] <= 2, (did, out[did])


def test_e10_split_is_leakage_free_and_proportioned(spark):
    """E10 contract: no confirmed near-dup pair straddles the
    train/val/test cut (structural decontamination), every cluster is
    split-homogeneous, and the per-lang cluster proportions honor the
    80/10/10 discipline at cluster grain."""
    from collections import Counter

    from x17a5_spark.queries.dedup import (
        d3_minhash_lsh,
        e10_leakage_safe_split,
    )

    sf = "/root/testdata/sf0.001"
    out = e10_leakage_safe_split(spark, sf).collect()
    split_of = {r["doc_id"]: r["split"] for r in out}
    cluster_of = {r["doc_id"]: r["cluster_id"] for r in out}

    # 1. no near-dup pair straddles the cut
    pairs = d3_minhash_lsh(spark, sf).collect()
    assert pairs, "fixture produced no near-dup pairs"
    for p in pairs:
        assert split_of[p["id_a"]] == split_of[p["id_b"]], p
        assert cluster_of[p["id_a"]] == cluster_of[p["id_b"]], p

    # 2. clusters are split-homogeneous (function of cluster_id)
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())

    # 3. cluster-grain proportions: exactly floor-80/10/10 per rep lang
    rep_lang = {
        r["cluster_id"]: r["lang"] for r in out if r["doc_id"] == r["cluster_id"]
    }
    per_lang = Counter()
    split_counts = Counter()
    for cid, splits in by_cluster.items():
        per_lang[rep_lang[cid]] += 1
        split_counts[(rep_lang[cid], next(iter(splits)))] += 1
    for lang, n_cl in per_lang.items():
        n_train = split_counts[(lang, "train")]
        n_val = split_counts[(lang, "val")]
        assert n_train == int(0.8 * n_cl) or n_train == n_cl * 8 // 10, (
            lang, n_cl, n_train,
        )
        assert n_train + n_val == n_cl * 9 // 10 or n_train + n_val == int(
            0.9 * n_cl
        ), (lang, n_cl, n_val)


def test_paragraph_dedup_operator_edge_shapes(spark):
    """dedup_paragraphs on adversarial in-memory docs: empty text,
    whitespace-only, single token, exact 12-token multiple, intra-doc
    duplicate paragraphs (keep-first within one doc), and short-tail
    immunity."""
    from x17a5_spark.operators.paragraphs import dedup_paragraphs

    para = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    assert len(para.split()) == 12
    short = "one two three"
    rows = [
        (0, ""),  # empty
        (1, "   "),  # whitespace-only
        (2, "solo"),  # single token (short tail, always kept)
        (3, para),  # exactly one full paragraph
        (4, para + " " + para),  # intra-doc duplicate paragraph
        (5, para + " " + short),  # dup of doc 3's paragraph + short tail
        (6, short),  # identical short text to doc 5's tail — still kept
        # a paragraph UNIQUE to doc 7 repeated twice — isolates the
        # intra-doc keep-first claim from cross-doc dedup (doc 4's
        # paragraphs also duplicate doc 3's, so doc 4 alone can't)
        (7, para.replace("alpha", "omega") + " " + para.replace("alpha", "omega")),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_paragraphs(docs).collect()}

    assert set(out) == set(range(8))
    # empty / whitespace-only: zero paragraphs, empty rebuild
    for did in (0, 1):
        assert out[did]["n_para"] == 0 and out[did]["n_kept"] == 0
        assert out[did]["text_dedup"] == ""
    # single-token doc: one short paragraph, always kept
    assert out[2]["n_para"] == 1 and out[2]["n_kept"] == 1
    assert out[2]["text_dedup"] == "solo"
    # doc 3 owns the paragraph (first occurrence corpus-wide)
    assert out[3]["n_kept"] == 1 and out[3]["text_dedup"] == para
    # doc 4: second intra-doc occurrence dropped (keep-first applies
    # WITHIN a document too)
    assert out[4]["n_para"] == 2 and out[4]["n_kept"] == 0
    assert out[4]["text_dedup"] == ""
    # doc 5: full paragraph deduped away, short ragged tail survives
    assert out[5]["n_para"] == 2 and out[5]["n_kept"] == 1
    assert out[5]["text_dedup"] == short
    # doc 6: whole doc is a short paragraph — never a dedup target even
    # though its text equals doc 5's surviving tail
    assert out[6]["n_kept"] == 1 and out[6]["text_dedup"] == short
    # doc 7: its paragraph exists NOWHERE else — intra-doc keep-first in
    # isolation keeps exactly the first of the two occurrences
    assert out[7]["n_para"] == 2 and out[7]["n_kept"] == 1
    assert out[7]["text_dedup"] == para.replace("alpha", "omega")


def test_paragraph_dedup_delimiter_mode_on_newline_fixtures(spark):
    """Delimiter mode (VERDICT r7 #6): paragraphs follow blank-line
    structure; only oversized spans get fixed-width chunked; empty
    spans vanish before positions are assigned; prepending a span does
    NOT shift-misalign the others (the fixed-width mode's weakness)."""
    from x17a5_spark.operators.paragraphs import dedup_paragraphs

    boiler = "copyright notice all rights reserved license"  # 7 tokens
    body_a = "alpha beta gamma delta epsilon zeta"  # 6 tokens
    body_b = "one two three four five six seven"  # 7 tokens
    # 26 tokens: an OVERSIZED span -> chunks of 12/12/2 with pt=12
    run_on = " ".join(f"w{i}" for i in range(26))
    rows = [
        (0, f"{body_a}\n\n{body_b}"),  # the originals
        (1, f"{boiler}\n\n{body_a}\n\n{body_b}"),  # copy + boilerplate span
        (2, f"\n\n\n{body_a}\n\n\n\n{boiler}\n\n"),  # empty spans + reuse
        (3, run_on),
        (4, run_on + "\n\n" + body_a),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in dedup_paragraphs(docs, delimiter=r"\n\s*\n").collect()
    }
    # doc 0 owns both body spans
    assert out[0]["n_para"] == 2 and out[0]["n_kept"] == 2
    assert out[0]["text_dedup"] == f"{body_a} {body_b}"
    # doc 1: the copy's body spans align with doc 0's EXACTLY (no
    # phase shift) and dedup away; its boilerplate span survives as
    # the corpus-wide first occurrence
    assert out[1]["n_para"] == 3 and out[1]["n_kept"] == 1
    assert out[1]["text_dedup"] == boiler
    # doc 2: empty spans dropped (2 real paragraphs), both duplicate
    # earlier docs' spans -> nothing kept
    assert out[2]["n_para"] == 2 and out[2]["n_kept"] == 0
    # doc 3: one oversized span chunked 12/12/2; the 2-token tail is
    # short (< min_tokens) and always kept
    assert out[3]["n_para"] == 3 and out[3]["n_kept"] == 3
    assert out[3]["text_dedup"] == run_on
    # doc 4: run-on chunks dedup against doc 3's (same chunk phase
    # within the span), except the short tail which is never a target;
    # its body_a span also dedups
    assert out[4]["n_para"] == 4 and out[4]["n_kept"] == 1
    assert out[4]["text_dedup"] == "w24 w25"


def test_paragraph_dedup_doc_id_packing_bound_fails_loud(spark):
    """ADVICE r7: a doc_id past the 2^43 packing id-space must raise
    (the packed long would silently corrupt ordering otherwise)."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from x17a5_spark.operators.paragraphs import IDSPACE, dedup_paragraphs

    docs = spark.createDataFrame(
        [(IDSPACE, "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu")],
        "doc_id long, text string",
    )
    with pytest.raises((Py4JJavaError, Exception), match="packing bounds"):
        dedup_paragraphs(docs).collect()


def test_e11_keeps_best_quality_per_cluster(spark):
    """e11 contract: exactly one keeper per cluster, the keeper is the
    quality-argmax (ties -> lowest doc_id) recomputed from the output
    itself, and planted truncated copies lose to their longer originals
    whenever they share a cluster."""
    from x17a5_spark.queries.dedup import e11_cluster_canonical

    sf = "/root/testdata/sf0.001"
    rows = e11_cluster_canonical(spark, sf).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)

    for cid, members in by_cluster.items():
        keepers = [m for m in members if m["is_kept"]]
        assert len(keepers) == 1, (cid, keepers)
        best = max(members, key=lambda m: (m["quality"], -m["doc_id"]))
        assert keepers[0]["doc_id"] == best["doc_id"], (cid, best)
        assert all(m["keeper_id"] == best["doc_id"] for m in members)

    # planted copies (doc_id + 100000) are 90%-token truncations: in
    # every cluster containing an original and its copy, the original
    # must win unless the copy genuinely scores higher (it can't on the
    # length term; allow equality-free strict check on a sample)
    mixed = [
        ms for ms in by_cluster.values()
        if {m["doc_id"] < 100000 for m in ms} == {True, False}
    ]
    assert mixed, "no cluster mixes originals and planted copies"
    orig_wins = sum(
        1 for ms in mixed if next(m for m in ms if m["is_kept"])["doc_id"] < 100000
    )
    assert orig_wins / len(mixed) > 0.9, (orig_wins, len(mixed))


def test_d3_packing_tripwire_fails_loud_on_widened_substring():
    """Round 9 (VERDICT r8 #5): the numeric-minhash packing bound is a
    build-time tripwire, not a comment. Both engines derive their hex
    substring from D3_HEX_CHARS, and _d3_pack_guard() runs at module
    import — so widening the substring past 14 chars (packed values
    reaching the 2^62 sentinel) or growing N_MINHASH past the low
    nibble fails BOTH engines loudly at build time."""
    import pytest

    from x17a5_spark.queries import dedup as D

    # the shipped constants satisfy the invariant (import succeeded)
    D._d3_pack_guard()
    # one extra hex char overflows the packed range into the sentinel
    with pytest.raises(ValueError, match="packing overflow"):
        D._d3_pack_guard(hex_chars=D.D3_HEX_CHARS + 1)
    # borrow distance must fit the low nibble
    with pytest.raises(ValueError, match="densification overflow"):
        D._d3_pack_guard(n_minhash=17)
    # no silent drift: the oracle chain interpolates the SAME constant
    assert f"[2:{1 + D.D3_HEX_CHARS}]" in D._D3_CHAIN
    assert str(D.D3_SENTINEL) in D._D3_CHAIN


def test_d18_near_dedup_catches_drifted_boilerplate_exact_misses(spark):
    """The d18 motivation, pinned end-to-end (round 12): boilerplate
    whose 7th token drifts per copy survives EXACT paragraph dedup
    (d15/d16 keep one instance per distinct drift value — 5 here) but
    must collapse to the single corpus-first keeper under d18's
    paragraph-grain minhash banding + Jaccard confirm. The copies'
    body spans are exact duplicates of their originals and must die
    at J = 1 through the same near-dup path."""
    from pyspark.sql import functions as F

    from x17a5_spark.operators.paragraphs import dedup_paragraphs
    from x17a5_spark.queries.dedup import (
        AUG_TWIN_OFFSET,
        D16_DELIM,
        D18_BOILER_PRE,
        D18_BOILER_POST,
        d18_paragraph_near_dedup,
        guarded_twin_id,
    )
    from x17a5_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    rows = d18_paragraph_near_dedup(spark, sf).collect()
    copies = [r for r in rows if r["doc_id"] >= 6 * AUG_TWIN_OFFSET]
    assert len(copies) == 50
    near_kept = [
        r["doc_id"] for r in copies if D18_BOILER_PRE in r["text_dedup"]
    ]
    # ONE keeper: the corpus-first boilerplate span; every drifted
    # variant band-collides with an earlier one and confirms >= tau
    assert near_kept == [6 * AUG_TWIN_OFFSET]
    # body spans are exact dups of the originals -> most copies strip
    # to (at most) noise tails
    assert sum(r["n_kept"] for r in copies) < sum(r["n_para"] for r in copies) / 2

    # the SAME fixture through the EXACT machinery keeps one instance
    # per drift value — the one-token-drift escape d18 exists to close
    docs = load_table(spark, sf, "documents").select(
        "doc_id", F.regexp_replace("text", "table", "\n\n").alias("text")
    )
    boiler = F.concat_ws(
        " ",
        F.lit(D18_BOILER_PRE),
        (F.col("doc_id") % 50 / 10).cast("long").cast("string"),
        F.lit(D18_BOILER_POST),
    )
    cps = docs.filter(F.col("doc_id") % 10 == 0).select(
        guarded_twin_id(F.col("doc_id"), 6, "t").alias("doc_id"),
        F.concat_ws("\n\n", boiler, F.col("text")).alias("text"),
    )
    exact = dedup_paragraphs(
        docs.unionByName(cps), delimiter=D16_DELIM
    ).collect()
    exact_kept = [
        r["doc_id"]
        for r in exact
        if r["doc_id"] >= 6 * AUG_TWIN_OFFSET
        and D18_BOILER_PRE in r["text_dedup"]
    ]
    assert len(exact_kept) == 5  # one per drift value: the missed class
