"""Replays of the reference's cache-adapter unit tests
(/root/reference/crates/wingfoil/tests/cache_adapter.rs) against
``sources.cache`` — key digest contracts (including the reference's exact
pinned stability hex), config clear, round trip, miss, atomic write,
corrupt-entry error, mtime-LRU eviction, and the get-or-fetch reader
shape."""

import os
import time

import pytest

from wingfoil_spark.sources.cache import (
    CacheConfig,
    CacheKey,
    FileCache,
    cached_query,
)


def _key(s):
    return CacheKey.from_parts(["localhost", "5000", s])


# ------------------------------------------------------------------- keys


def test_key_uniqueness():
    """cache_adapter.rs:31-36."""
    k1 = _key("select from trades where date=0")
    k2 = _key("select from trades where date=1")
    assert k1 != k2


def test_key_same_input_same_output():
    """cache_adapter.rs:38-43."""
    assert _key("select from trades") == _key("select from trades")


def test_key_separator_prevents_collision():
    """cache_adapter.rs:45-51: ["ab","c"] vs ["a","bc"] must differ."""
    assert CacheKey.from_parts(["ab", "c", "q"]) != CacheKey.from_parts(["a", "bc", "q"])


def test_key_stability():
    """cache_adapter.rs:53-59: the EXACT 16-char hex prefix the reference
    pins — same algorithm (SHA-256, NUL separators) → same digest."""
    assert repr(_key("select from trades")) == 'CacheKey("5899c93491e25e68")'


# ----------------------------------------------------------------- config


def test_cache_config_clear(tmp_path):
    """cache_adapter.rs:61-85: .cache files deleted, other files kept,
    missing folder is fine."""
    (tmp_path / "a.cache").write_bytes(b"data")
    (tmp_path / "b.cache").write_bytes(b"data")
    (tmp_path / "other.txt").write_bytes(b"keep")
    CacheConfig(str(tmp_path)).clear()
    assert not (tmp_path / "a.cache").exists()
    assert not (tmp_path / "b.cache").exists()
    assert (tmp_path / "other.txt").exists()
    CacheConfig(str(tmp_path / "nonexistent")).clear()  # Ok(())


# -------------------------------------------------------------- FileCache


def mk(spark, rows):
    return spark.createDataFrame(rows, "ts long, v double")


def test_round_trip(spark, tmp_path):
    """cache_adapter.rs:128-151."""
    cache = FileCache(CacheConfig(str(tmp_path)))
    key = _key("round_trip")
    cache.put(key, "select from t", mk(spark, [(1_000, 1.0), (2_000, 2.0)]))
    out = sorted(cache.get(spark, key).collect())
    assert [(r.ts, r.v) for r in out] == [(1_000, 1.0), (2_000, 2.0)]
    # the header self-documents the producing query (head -1 contract)
    assert cache.header(key) == "select from t"


def test_multiline_query_header_stays_one_line(spark, tmp_path):
    """cache.rs:133-144 + :211-219: a multi-line query is escaped into ONE
    header line, so the payload framing (first newline) survives and the
    entry keeps hitting instead of silently re-fetching every run."""
    cache = FileCache(CacheConfig(str(tmp_path)))
    key = _key("multiline")
    q = "select *\nfrom t\rwhere a=\\1"
    cache.put(key, q, mk(spark, [(1, 1.0)]))
    raw = (tmp_path / f"{key.hex}.cache").read_bytes()
    header = raw[: raw.find(b"\n")].decode()
    assert "\n" not in header and "\r" not in header
    assert cache.header(key) == q  # unescape round-trips
    assert cache.get(spark, key).count() == 1  # framing intact


def test_cache_miss(spark, tmp_path):
    """cache_adapter.rs:153-163."""
    cache = FileCache(CacheConfig(str(tmp_path)))
    assert cache.get(spark, _key("nonexistent")) is None


def test_atomic_write_no_tmp_leftover(spark, tmp_path):
    """cache_adapter.rs:165-181."""
    cache = FileCache(CacheConfig(str(tmp_path)))
    key = _key("atomic")
    cache.put(key, "q", mk(spark, [(1_000, 42.0)]))
    assert not (tmp_path / f"{key.hex}.tmp").exists()
    assert (tmp_path / f"{key.hex}.cache").exists()


def test_corrupt_file_returns_err(spark, tmp_path):
    """cache_adapter.rs:184-200: a file with a header but garbage payload
    is an ERROR, not a miss."""
    cache = FileCache(CacheConfig(str(tmp_path)))
    key = _key("corrupt")
    (tmp_path / f"{key.hex}.cache").write_bytes(
        b"select from t\ngarbage bytes not valid arrow"
    )
    with pytest.raises(ValueError, match="corrupt cache payload"):
        cache.get(spark, key)
    # header-less file is the other corruption class
    key2 = _key("headerless")
    (tmp_path / f"{key2.hex}.cache").write_bytes(b"no newline at all")
    with pytest.raises(ValueError, match="missing header newline"):
        cache.get(spark, key2)


def test_lru_eviction(spark, tmp_path):
    """cache_adapter.rs:202-270: when the cache is full the OLDEST-mtime
    file is evicted; a get() touches mtime so recently-read entries
    survive."""
    probe = FileCache(CacheConfig(str(tmp_path)))
    key_a, key_b, key_c = _key("lru_a"), _key("lru_b"), _key("lru_c")
    probe.put(key_a, "q_a", mk(spark, [(1_000, 1.0)]))
    file_size = (tmp_path / f"{key_a.hex}.cache").stat().st_size

    cache = FileCache(CacheConfig(str(tmp_path), max_size_bytes=file_size * 2))
    cache.put(key_b, "q_b", mk(spark, [(2_000, 2.0)]))
    assert (tmp_path / f"{key_a.hex}.cache").exists()
    assert (tmp_path / f"{key_b.hex}.cache").exists()

    # age key_b, then touch key_a via get() → key_b becomes the LRU entry
    old = time.time() - 3600
    os.utime(tmp_path / f"{key_b.hex}.cache", (old, old))
    os.utime(tmp_path / f"{key_a.hex}.cache", (old + 1, old + 1))
    assert cache.get(spark, key_a) is not None  # mtime touched to "now"

    cache.put(key_c, "q_c", mk(spark, [(3_000, 3.0)]))
    assert not (tmp_path / f"{key_b.hex}.cache").exists(), "LRU evicted"
    assert (tmp_path / f"{key_a.hex}.cache").exists(), "recently-used kept"
    assert (tmp_path / f"{key_c.hex}.cache").exists(), "just-written kept"


def test_cached_query_get_or_fetch(spark, tmp_path):
    """The kdb_read_cached reader shape (kdb/read.rs:445): first call
    fetches and writes, second call hits without fetching; a corrupt entry
    is treated as a miss and repaired by re-fetch."""
    cache = FileCache(CacheConfig(str(tmp_path)))
    calls = []

    def fetch():
        calls.append(1)
        return mk(spark, [(1, 1.0), (2, 2.0)])

    parts = ["localhost", "5000", "select slice"]
    assert cached_query(spark, cache, parts, "select slice", fetch).count() == 2
    assert cached_query(spark, cache, parts, "select slice", fetch).count() == 2
    assert len(calls) == 1, "second call must hit the cache"

    # corrupt the entry → next call re-fetches and overwrites
    key = CacheKey.from_parts(parts)
    (tmp_path / f"{key.hex}.cache").write_bytes(b"q\nnot arrow")
    assert cached_query(spark, cache, parts, "select slice", fetch).count() == 2
    assert len(calls) == 2
    assert cache.get(spark, key).count() == 2, "entry repaired"
