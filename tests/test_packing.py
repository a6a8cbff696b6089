from pyspark.sql import functions as F

from parallel_betweenness_centrality_using_bsp_spark.operators.features import pack_sequences


def _hand_pack(lengths, S):
    """Sequential reference: concatenate docs in id order, slice every S."""
    rows, off = [], 0
    for doc_id, n in sorted(lengths.items()):
        k = off // S
        while k * S < off + n:
            gs, ge = max(off, k * S), min(off + n, (k + 1) * S)
            rows.append((doc_id, k, gs - k * S, gs - off, ge - gs))
            k += 1
        off += n
    return sorted(rows)


def _fixture(spark, lengths):
    return spark.createDataFrame(
        [(d, "w " * n) for d, n in lengths.items()], "doc_id long, text string"
    ).select("doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"))


def test_pack_sequences_matches_hand_pack(spark):
    lengths = {i: (i * 37) % 90 + 1 for i in range(50)}
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_pos"], r["doc_start"], r["seg_len"])
        for r in pack_sequences(_fixture(spark, lengths), 128).collect()
    )
    assert got == _hand_pack(lengths, 128)


def test_pack_sequences_invariants(spark):
    lengths = {i: (i * 13) % 300 + 1 for i in range(80)}
    S = 100
    rows = pack_sequences(_fixture(spark, lengths), S).collect()

    # every chunk except the last is exactly full
    per_chunk = {}
    for r in rows:
        per_chunk[r["chunk_id"]] = per_chunk.get(r["chunk_id"], 0) + r["seg_len"]
    last = max(per_chunk)
    assert all(v == S for k, v in per_chunk.items() if k != last)
    assert 0 < per_chunk[last] <= S
    assert set(per_chunk) == set(range(last + 1))  # no chunk gaps

    # every document's segments partition it, in order
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for d, segs in per_doc.items():
        segs.sort(key=lambda r: r["doc_start"])
        assert segs[0]["doc_start"] == 0
        for a, b in zip(segs, segs[1:]):
            assert a["doc_start"] + a["seg_len"] == b["doc_start"]
        assert sum(r["seg_len"] for r in segs) == lengths[d]
        # a doc spans > 1 chunk only via full chunk boundaries
        for r in segs:
            assert 0 <= r["chunk_pos"] and r["chunk_pos"] + r["seg_len"] <= S

    # total mass
    assert sum(per_chunk.values()) == sum(lengths.values())


def test_pack_sequences_long_doc_spans_many_chunks(spark):
    lengths = {1: 10, 2: 1000, 3: 10}
    S = 64
    rows = pack_sequences(_fixture(spark, lengths), S).collect()
    segs2 = [r for r in rows if r["doc_id"] == 2]
    assert len(segs2) == len({r["chunk_id"] for r in segs2})  # one row per chunk
    assert len(segs2) >= 1000 // S  # fans out proportionally, no more


def test_build_vocab_and_encode_round_trip(spark):
    from parallel_betweenness_centrality_using_bsp_spark.operators.features import (
        build_vocab,
        encode_docs,
    )

    rows = [
        (0, "b a a c"),
        (1, "a b b"),
        (2, "c a d"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = {r["term"]: (r["term_id"], r["count"]) for r in build_vocab(docs).collect()}
    # counts: a=4, b=3, c=2, d=1 -> ids by (count desc, term asc)
    assert vocab == {"a": (0, 4), "b": (1, 3), "c": (2, 2), "d": (3, 1)}

    enc = encode_docs(docs, build_vocab(docs)).collect()
    got = {}
    for r in enc:
        got.setdefault(r["doc_id"], {})[r["pos"]] = r["term_id"]
    for d, text in rows:
        toks = text.split()
        assert [got[d][p] for p in range(len(toks))] == [vocab[t][0] for t in toks]

    # min_count / max_size prune; OOV terms are dropped by encode
    small = build_vocab(docs, min_count=2)
    assert {r["term"] for r in small.collect()} == {"a", "b", "c"}
    enc2 = encode_docs(docs, small).collect()
    assert all(r["term_id"] <= 2 for r in enc2)
    assert len(enc2) == len(enc) - 1  # exactly the single 'd' dropped
    top2 = build_vocab(docs, max_size=2)
    assert {r["term"] for r in top2.collect()} == {"a", "b"}


def test_vocab_ids_are_dense_and_deterministic(spark):
    from parallel_betweenness_centrality_using_bsp_spark.operators.features import build_vocab

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * j) % 97}" for j in range(1, 40))) for i in range(60)],
        "doc_id long, text string",
    )
    a = sorted((r["term"], r["term_id"]) for r in build_vocab(docs).collect())
    b = sorted((r["term"], r["term_id"]) for r in build_vocab(docs).collect())
    assert a == b
    ids = sorted(i for _, i in a)
    assert ids == list(range(len(ids)))
