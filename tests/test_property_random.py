"""Randomized-workload parity (reference test strategy §5:
DatabusEventRandomProducer / DbusEventGenerator analogs, but
deterministic via hypothesis): random changelogs -> engine snapshot
must equal the DuckDB oracle; random batch splits/orders -> the MERGE
store must converge to the same state.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),  # key
        st.sampled_from(["UPSERT", "UPSERT", "UPSERT", "DELETE"]),
        st.integers(min_value=0, max_value=10_000),  # payload value
    ),
    min_size=1,
    max_size=60,
)


def _changelog_df(spark, events):
    rows = [
        (i + 1, str(k), k, op, float(v), "rand")
        for i, (k, op, v) in enumerate(events)
    ]
    return spark.createDataFrame(
        rows, "scn LONG, key_str STRING, key_num LONG, opcode STRING, val DOUBLE, source STRING"
    )


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(events=events_strategy)
def test_snapshot_matches_duckdb_on_random_changelog(spark, events):
    from databus_spark.operators.compaction import snapshot

    df = _changelog_df(spark, events)
    got = sorted(
        tuple(r)
        for r in snapshot(df, key_cols=("key_str",)).select("key_str", "scn", "val").collect()
    )
    con = duckdb.connect()
    con.register("log", df.toPandas())
    exp = sorted(
        con.execute(
            """
            SELECT key_str, scn, val FROM (
                SELECT *, row_number() OVER (PARTITION BY key_str ORDER BY scn DESC) rn
                FROM log
            ) WHERE rn = 1 AND opcode <> 'DELETE'
            """
        ).fetchall()
    )
    assert got == exp


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events=events_strategy,
    split=st.integers(min_value=1, max_value=5),
    order_seed=st.integers(min_value=0, max_value=1000),
)
def test_merge_store_order_invariant(spark, tmp_path_factory, events, split, order_seed):
    """Any batch partition of the log, merged in any order, converges to
    the compaction of the full log (idempotent last-wins MERGE)."""
    import random

    from databus_spark.operators.compaction import snapshot
    from databus_spark.store.snapshot import ParquetSnapshotStore

    df = _changelog_df(spark, events).localCheckpoint(eager=True)
    n = df.count()
    chunk = max(1, n // split)
    batches = [
        df.where((F.col("scn") > i * chunk) & (F.col("scn") <= (i + 1) * chunk))
        for i in range((n + chunk - 1) // chunk + 1)
    ]
    rng = random.Random(order_seed)
    rng.shuffle(batches)

    root = tmp_path_factory.mktemp("prop_store")
    store = ParquetSnapshotStore(spark, str(root), key_cols=("source", "key_str"))
    for b in batches:
        if b.limit(1).count():
            store.merge(b)

    got = sorted(
        tuple(r) for r in store.read().select("key_str", "scn", "val").collect()
    )
    exp = sorted(
        tuple(r)
        for r in snapshot(df, key_cols=("source", "key_str")).select("key_str", "scn", "val").collect()
    )
    assert got == exp


@given(spec=st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)), max_size=6))
@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
def test_filterconfig_parse_ranges_roundtrip(spec):
    """parse_ranges accepts any '[a-b,c]' spec and yields half-open ranges."""
    from databus_spark.plans.filterconfig import parse_ranges

    pieces = [f"{min(a, b)}-{max(a, b)}" if a != b else str(a) for a, b in spec]
    parsed = parse_ranges("[" + ",".join(pieces) + "]")
    assert len(parsed) == len(spec)
    for (a, b), (lo, hi) in zip(spec, parsed):
        assert lo == min(a, b) and hi == max(a, b) + 1


_bmp_char = st.characters(
    min_codepoint=1, max_codepoint=0xFFFF, blacklist_categories=("Cs",)
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(strings=st.lists(st.text(alphabet=_bmp_char, max_size=40), min_size=1, max_size=60))
def test_java_hashcode_property_bmp(spark, strings):
    """The AND-fold Java String.hashCode must equal the definitional fold
    for ARBITRARY BMP strings (one Spark job per example batch)."""
    from pyspark.sql import functions as F

    from databus_spark.functions.hashes import java_string_hashcode

    def jhash(s):
        h = 0
        for ch in s:
            h = (h * 31 + ord(ch)) & 0xFFFFFFFF
        return h - 4294967296 if h >= 2147483648 else h

    df = spark.createDataFrame([(i, s) for i, s in enumerate(strings)], "i INT, s STRING")
    got = {r["i"]: r["h"] for r in df.select("i", java_string_hashcode(F.col("s")).alias("h")).collect()}
    for i, s in enumerate(strings):
        assert got[i] == jhash(s), repr(s)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    keys=st.lists(
        st.one_of(
            st.integers(-(2**40), 2**40).map(str),
            st.text(alphabet=_bmp_char, max_size=24),
            st.text(alphabet=st.sampled_from("+-0123456789"), max_size=24),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_key_mod_bucket_matches_reference_parse_rules(spark, keys):
    """key_mod_bucket must follow KeyModFilter.java:60-76 for arbitrary
    string keys: Long.parseLong semantics over ASCII digits (no trim,
    explicit sign, long range) else abs(hashCode) — including
    digit-shaped junk like '1-2', overflow literals, and bare signs.
    (Known scoped divergence: Java's parseLong also accepts non-ASCII
    Unicode digits; the engine and its DuckDB oracle both hash those.)"""
    from pyspark.sql import functions as F

    from databus_spark.functions.hashes import java_string_hashcode
    from databus_spark.operators.filters import key_mod_bucket

    def jhash(s):
        h = 0
        for ch in s:
            h = (h * 31 + ord(ch)) & 0xFFFFFFFF
        return h - 4294967296 if h >= 2147483648 else h

    def expected(s):
        try:  # Long.parseLong: optional sign, digits only, no trim
            if not s or s in "+-":
                raise ValueError
            body = s[1:] if s[0] in "+-" else s
            if not body.isascii() or not body.isdigit():
                raise ValueError
            v = int(s)
            if not (-(2**63) <= v < 2**63):
                raise ValueError
            return abs(v)
        except ValueError:
            return abs(jhash(s))

    df = spark.createDataFrame(
        [(i, None, s) for i, s in enumerate(keys)], "i INT, key_num LONG, key_str STRING"
    )
    got = {r["i"]: r["b"] for r in df.select("i", key_mod_bucket().alias("b")).collect()}
    for i, s in enumerate(keys):
        assert got[i] == expected(s), repr(s)


# -- round-5 codecs & layout properties --------------------------------------

png_image_strategy = st.tuples(
    st.integers(min_value=1, max_value=12),  # height
    st.integers(min_value=1, max_value=12),  # width
    st.sampled_from([1, 3]),                 # channels (gray / RGB)
    st.integers(min_value=0, max_value=2**31 - 1),  # pixel seed
)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(img=png_image_strategy)
def test_png_codec_roundtrip_random_images(img):
    """Encode(filter-cycling) -> decode must reproduce any 8-bit image
    exactly, for every size/channel combination the codec supports."""
    import numpy as np

    from databus_spark.operators.multimodal import png_decode, png_encode

    h, w, ch, seed = img
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, ch) if ch > 1 else (h, w), dtype=np.uint8)
    out = png_decode(png_encode(px))
    assert out.shape == (h, w, ch)
    expect = px if ch > 1 else px[:, :, None]
    assert (out == expect).all()


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_zorder_key_is_bijective_bit_interleave(spark, pairs):
    """The Morton key must be invertible: de-interleaving the bits of
    z recovers (x, y) exactly for any pair of bucketed values."""
    from pyspark.sql import functions as F

    from databus_spark.operators.layout import zorder_key

    df = spark.createDataFrame(pairs, ["x", "y"]).select(
        "x", "y", zorder_key(F.col("x"), F.col("y"), bits=8).alias("z")
    )
    for r in df.collect():
        z = r["z"]
        x = sum(((z >> (2 * i)) & 1) << i for i in range(8))
        y = sum(((z >> (2 * i + 1)) & 1) << i for i in range(8))
        assert (x, y) == (r["x"], r["y"])


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=120),
        min_size=1,
        max_size=12,
    )
)
def test_span_dedup_profile_invariants(spark, texts):
    """For ANY corpus: dup windows never exceed windows, fractions stay
    in [0,1], and summed first-occurrences equal the number of distinct
    window texts."""
    from pyspark.sql import functions as F

    from databus_spark.operators.dedup import span_dedup_profile

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    rows = span_dedup_profile(docs, win=3).collect()
    n_firsts = sum(r["n_windows"] - r["n_dup_windows"] for r in rows)
    # reference window set computed independently in Python (mirrors the
    # operator's tokenization: split('\s+') over lower(trim(text)))
    import re

    wins = set()
    for t in texts:
        toks = re.split(r"\s+", t.strip().lower())
        for i in range(len(toks) // 3):
            wins.add(" ".join(toks[i * 3 : i * 3 + 3]))
    distinct_windows = len(wins)
    for r in rows:
        assert 0 <= r["n_dup_windows"] <= r["n_windows"]
        assert 0.0 <= r["dup_fraction"] <= 1.0
    assert n_firsts == distinct_windows


@given(
    seed=st.integers(0, 2**31 - 1),
    hb=st.integers(1, 3),
    wb=st.integers(1, 3),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_roundtrip_envelope_property(seed, hb, wb):
    """Property: ANY 8-bit grayscale image (dims multiple of 8)
    round-trips through the baseline-JPEG codec within the +-1 DCT
    rounding envelope under the flat q=1 table — Huffman coding, byte
    stuffing, DC prediction, and the IDCT hold for arbitrary content,
    not just the oracle's constant blocks."""
    import numpy as np

    from databus_spark.operators.multimodal import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(seed)  # hypothesis-driven seed: reproducible
    img = rng.integers(0, 256, size=(hb * 8, wb * 8), dtype=np.uint8)
    out = jpeg_decode(jpeg_encode(img))
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    hashes=st.lists(
        st.integers(min_value=0, max_value=(1 << 56) - 1),
        min_size=2,
        max_size=40,
        unique=True,
    ),
    max_hamming=st.integers(min_value=1, max_value=3),
)
def test_bithash_near_pairs_matches_bruteforce(spark, hashes, max_hamming):
    """Banded pair-gen == brute force all-pairs at <= max_hamming for
    any hash set small enough that no band bucket hits the cap
    (pigeonhole recall is exact, the hamming filter is exact)."""
    from databus_spark.operators.dedup import bithash_near_pairs

    rows = [(i, h) for i, h in enumerate(hashes)]
    sig = spark.createDataFrame(rows, "doc_id BIGINT, h BIGINT")
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in bithash_near_pairs(sig, "h", 56, max_hamming).collect()
    }
    want = {
        (i, j, bin(hashes[i] ^ hashes[j]).count("1"))
        for i in range(len(hashes))
        for j in range(i + 1, len(hashes))
        if bin(hashes[i] ^ hashes[j]).count("1") <= max_hamming
    }
    assert got == want


# --- ExactSubstr differential: Spark pipeline vs a brute-force Python
# reference on random small corpora (window hashing, span merging, and
# the keep-globally-first policy re-derived independently) -------------

def _exsub_reference(texts: dict[int, str], win: int):
    """Brute-force ExactSubstr: returns {doc_id: set(removed 1-based
    token positions)} under keep-globally-first."""
    toks = {d: t.lower().strip().split() for d, t in texts.items()}
    occs: dict[tuple, list] = {}
    for d in sorted(toks):
        ts = toks[d]
        for p in range(1, len(ts) - win + 2):
            occs.setdefault(tuple(ts[p - 1 : p - 1 + win]), []).append((d, p))
    removed: dict[int, set] = {d: set() for d in toks}
    for w, lst in occs.items():
        if len(lst) < 2:
            continue
        first = min(lst)
        for d, p in lst:
            if (d, p) != first:
                removed[d].update(range(p, p + win))
    return toks, removed


words_strategy = st.lists(
    st.lists(st.sampled_from(list("abcdef")), min_size=1, max_size=40).map(
        lambda ws: " ".join(ws)
    ),
    min_size=2,
    max_size=8,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=words_strategy)
def test_exactsubstr_matches_bruteforce_reference(spark, texts):
    """Random corpora over a 6-word alphabet (dense repeats, heavy
    self-overlap — the pathological class for greedy span cutting):
    the distributed pipeline must equal the brute-force reference
    exactly, doc by doc, token by token. win=3 keeps windows dense."""
    from databus_spark.operators import dedup as D

    win = 3
    corpus = {i: t for i, t in enumerate(texts)}
    toks, removed = _exsub_reference(corpus, win)
    docs = spark.createDataFrame(
        [(d, t) for d, t in corpus.items()], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in D.exactsubstr_dedup(docs, win=win).collect()}
    assert set(out) == set(corpus)
    for d in corpus:
        keep = [t for i, t in enumerate(toks[d], start=1) if i not in removed[d]]
        assert out[d]["n_tokens"] == len(toks[d])
        assert out[d]["n_removed"] == len(removed[d] & set(range(1, len(toks[d]) + 1)))
        assert out[d]["clean_text"] == " ".join(keep)


# --- Water-fill differential: Spark vs a brute-force Python reference
# (sorted-prefix water level re-derived independently) -----------------

wf_strategy = st.lists(
    st.tuples(
        st.sampled_from(["s0", "s1", "s2", "s3", "s4"]),
        st.integers(min_value=1, max_value=40),  # tokens in the doc
    ),
    min_size=1,
    max_size=30,
)


def _waterfill_reference(counts: dict[str, int], budget_ppm: int):
    total = sum(counts.values())
    b = total * budget_ppm // 1_000_000
    items = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(items)
    prefix = 0
    k = 0
    pk = 0
    for r, (_, c) in enumerate(items, start=1):
        if prefix + (n - r + 1) * c <= b:
            k += 1
            pk = prefix + c
        prefix += c
    lvl = (b - pk) // (n - k) if k < n else max(counts.values())
    return {s: min(c, lvl) for s, c in counts.items()}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=wf_strategy, ppm=st.sampled_from([100_000, 500_000, 900_000]))
def test_waterfill_matches_bruteforce_reference(spark, docs, ppm):
    from databus_spark.operators.shards import mixture_waterfill

    rows = [(i, "tok " * n, src) for i, (src, n) in enumerate(docs)]
    counts: dict[str, int] = {}
    for _, (src, n) in zip(rows, docs):
        counts[src] = counts.get(src, 0) + n
    expect = _waterfill_reference(counts, ppm)
    df = spark.createDataFrame(
        [(i, t.strip(), s) for i, t, s in rows], "doc_id long, text string, source string"
    )
    got = {r["source"]: r["quota_tokens"] for r in mixture_waterfill(df, budget_ppm=ppm).collect()}
    assert got == expect


# --- DSIR differential: Spark vs a pure-Python re-derivation of the
# hashed-feature likelihood-ratio arithmetic --------------------------

import hashlib as _hl


def _h64(s: str, seed: str) -> int:
    return int(_hl.md5(f"{seed}|{s}".encode()).hexdigest()[:15], 16)


def _dsir_reference(texts, langs, target="en", B=256):
    feats_by_doc = {}
    for d, t in texts.items():
        toks = t.lower().strip().split()
        feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        feats_by_doc[d] = [_h64(f, "dsir") % B for f in feats]
    c_r, c_t = {}, {}
    for d, fs in feats_by_doc.items():
        for f in fs:
            c_r[f] = c_r.get(f, 0) + 1
            if langs[d] == target:
                c_t[f] = c_t.get(f, 0) + 1
    t_r = sum(c_r.values())
    t_t = sum(c_t.values())
    w = {
        f: ((c_t.get(f, 0) + 1) * (t_r + B) * 1_000_000)
        // ((c_r[f] + 1) * (t_t + B))
        for f in c_r
    }
    out = {}
    for d, fs in feats_by_doc.items():
        score = sum(w[f] for f in fs)
        out[d] = (len(fs), score, score // len(fs))
    return out


dsir_strategy = st.lists(
    st.tuples(
        st.lists(st.sampled_from(list("pqrstu")), min_size=1, max_size=20).map(" ".join),
        st.sampled_from(["en", "zh"]),
    ),
    min_size=2,
    max_size=12,
).filter(lambda rows: any(l == "en" for _, l in rows))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=dsir_strategy)
def test_dsir_matches_pure_python_reference(spark, rows):
    from databus_spark.operators.shards import dsir_doc_scores

    texts = {i: t for i, (t, _) in enumerate(rows)}
    langs = {i: l for i, (_, l) in enumerate(rows)}
    expect = _dsir_reference(texts, langs)
    df = spark.createDataFrame(
        [(i, texts[i], langs[i]) for i in texts], "doc_id long, text string, lang string"
    )
    got = {
        r["doc_id"]: (r["n_feats"], r["score_micro"], r["per_feat_micro"])
        for r in dsir_doc_scores(df).collect()
    }
    assert got == expect
