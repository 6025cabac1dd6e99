"""Property-based tests (hypothesis) for the pure-Python layers: dialect
rewriting, plan parsing, merge-statement generation, salting math.  No
SparkSession needed — these run in milliseconds.
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from agentic_etl_poc_spark.functions.dialect import (
    rewrite_duckdb_sql,
    translate_strftime_tokens,
)
from agentic_etl_poc_spark.plans.model import plan_from_dict
from agentic_etl_poc_spark.plans.parser import infer_kind, parse_plan
from agentic_etl_poc_spark.sinks.jdbc_sink import merge_statements

_ident = st.text(string.ascii_lowercase, min_size=1, max_size=8)


@given(st.lists(st.sampled_from(["%Y", "%m", "%d", "%H", "%M", "%S", "-", "/", " ", ":"]), max_size=12))
def test_strftime_translation_total(parts):
    """Every strptime-token string translates without leftover % tokens."""
    fmt = "".join(parts)
    out = translate_strftime_tokens(fmt)
    assert "%" not in out
    # separators survive verbatim
    for ch in "-/ :":
        assert fmt.count(ch) == out.count(ch)


@given(
    col=_ident,
    fmt1=st.sampled_from(["%m/%d/%Y", "%Y-%m-%d", "%d.%m.%Y"]),
    fmt2=st.sampled_from(["%Y-%m-%d", "%H:%M:%S"]),
)
def test_rewrite_nested_strptime_balanced(col, fmt1, fmt2):
    """COALESCE(try_strptime(x, a), try_strptime(x, b)) rewrites BOTH calls
    and keeps parens balanced, whatever the identifiers."""
    sql = (
        f"SELECT COALESCE(try_strptime(CAST({col} AS VARCHAR), '{fmt1}'), "
        f"try_strptime(CAST({col} AS VARCHAR), '{fmt2}')) AS d FROM t"
    )
    out = rewrite_duckdb_sql(sql)
    assert "try_strptime" not in out
    assert out.count("(") == out.count(")")
    assert "to_timestamp" in out


@given(st.sampled_from([
    ({"db": {"conn_str": "postgresql://u:p@h/db"}}, "db"),
    ({"api": {"url": "https://api.example.test/x"}}, "api"),
    ({"csv": {"path": "data/file.csv"}}, "csv"),
    ({"json": {"path": "data/file.ndjson"}}, "json"),
    ({"json": {"path": "s3a://bucket/file.json"}}, "json"),
]))
def test_infer_kind_cases(case):
    src_dict, want = case
    src = plan_from_dict(
        {"source": {"kind": "auto", **src_dict}, "transform": {}, "load": {}}
    ).source
    assert infer_kind(src) == want


@given(
    keys=st.lists(_ident, min_size=1, max_size=3, unique=True),
    extras=st.lists(_ident, min_size=0, max_size=4, unique=True),
)
@settings(max_examples=50)
def test_merge_statements_shape(keys, extras):
    cols = keys + [c for c in extras if c not in keys]
    stmts = merge_statements("tgt", "tgt_stg", keys, cols)
    assert len(stmts) == 3
    ddl, idx, merge = stmts
    assert ddl.startswith('CREATE TABLE IF NOT EXISTS "tgt" ')
    assert "UNIQUE INDEX" in idx
    for k in keys:
        assert f'"{k}"' in merge
    # every non-key column gets an EXCLUDED update; keys never do
    non_keys = [c for c in cols if c not in keys]
    for c in non_keys:
        assert f'"{c}" = EXCLUDED."{c}"' in merge
    if non_keys:
        for k in keys:
            assert f'"{k}" = EXCLUDED."{k}"' not in merge


@given(st.integers(min_value=1, max_value=64), st.integers())
def test_salt_range_math(parts, h):
    """pmod semantics: salts always land in [0, parts)."""
    assert 0 <= h % parts < parts


def test_plan_parse_duplicate_keys_and_env(monkeypatch):
    monkeypatch.setenv("PBT_OUT", "/tmp/out.csv")
    plan = parse_plan(
        """
limits: {max_input_bytes: 1000}
transform:
  sql: SELECT 1
transform:
  sql: SELECT 2 AS x
load: {to: csv, file_path: $PBT_OUT}
"""
    )
    assert plan.transform.sql.strip() == "SELECT 2 AS x"
    assert plan.load.file_path == "/tmp/out.csv"


def test_to_jdbc_url_translation():
    from agentic_etl_poc_spark.sources.jdbc_source import to_jdbc_url

    url, props = to_jdbc_url("postgresql+psycopg2://u:pw@dbhost:5433/mydb")
    assert url == "jdbc:postgresql://dbhost:5433/mydb"
    assert props == {"user": "u", "password": "pw"}
    # default port + postgres alias
    url, props = to_jdbc_url("postgres://u@dbhost/mydb")
    assert url == "jdbc:postgresql://dbhost:5432/mydb"
    assert props == {"user": "u"}
    # jdbc passthrough
    url, props = to_jdbc_url("jdbc:mysql://h:3306/d")
    assert url == "jdbc:mysql://h:3306/d" and props == {}
    # garbage rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        to_jdbc_url("not a conn string")


# ---------- real media codecs (operators/multimodal.py) ----------
# Pure functions — no SparkSession; hypothesis drives the byte-level
# encode/decode round-trips the m03/m04 oracle entries rely on.

import struct

import numpy as np

from agentic_etl_poc_spark.operators.multimodal import (
    _decode_audio_real,
    _decode_image_real,
    _iter_ppm_frames,
    _pnm_header,
)


def _wav(rate, samples, bits=16, fmt=1, channels=1):
    if bits == 16:
        data = np.asarray(samples, dtype="<i2").tobytes()
    elif bits == 8:
        data = (np.asarray(samples, dtype=np.int64) + 128).astype(np.uint8).tobytes()
    elif bits == 32 and fmt == 1:
        data = np.asarray(samples, dtype="<i4").tobytes()
    else:  # float32
        data = np.asarray(samples, dtype="<f4").tobytes()
    return struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, fmt, channels, rate, rate * bits // 8 * channels,
        bits // 8 * channels, bits,
        b"data", len(data),
    ) + data


@given(
    st.sampled_from([8000, 16000, 44100]),
    st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=64),
)
@settings(max_examples=50)
def test_wav_pcm16_roundtrip(rate, samples):
    duration, got_rate, rms = _decode_audio_real(_wav(rate, samples))
    assert got_rate == rate
    assert duration == len(samples) / rate
    want = float(np.sqrt(np.mean((np.asarray(samples, dtype=np.float64) / 32768.0) ** 2)))
    assert rms == want


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=255),
)
@settings(max_examples=50)
def test_pnm_p5_constant_decode(w, h, v):
    payload = b"P5\n%d %d\n255\n" % (w, h) + bytes([v]) * (w * h)
    gw, gh, gc, luma = _decode_image_real(payload)
    assert (gw, gh, gc) == (w, h, 1)
    assert luma == v / 255.0  # integer-valued mean is exact in float64


@given(st.integers(min_value=1, max_value=6), st.integers(min_value=1, max_value=5))
@settings(max_examples=30)
def test_ppm_stream_splits_exactly(n_frames, w):
    frames = [
        b"P6\n%d 2\n255\n" % w + bytes([i % 256]) * (w * 2 * 3)
        for i in range(n_frames)
    ]
    got = list(_iter_ppm_frames(b"".join(frames)))
    assert got == frames


def test_pnm_header_comments_and_whitespace():
    payload = b"P5\n# a comment\n  3\t2 # trailing\n255\n" + bytes(6)
    magic, w, h, maxval, off = _pnm_header(payload)
    assert (magic, w, h, maxval) == (b"P5", 3, 2, 255)
    assert payload[off:] == bytes(6)


# ---------- sessionize state fn (streaming/events.py) ----------
# The numpy gaps-and-islands rewrite must preserve the exact boundary
# semantics of the original per-row loop: a session breaks only when the
# inter-arrival gap STRICTLY exceeds the threshold, and carried-over
# state merges with the first island iff the bridge gap allows.

import datetime as dt

import pandas as pd

from agentic_etl_poc_spark.streaming.events import _sessionize_fn


class _FakeState:
    def __init__(self, value=None):
        self._v = value
        self.hasTimedOut = False
        self.updated = None
        self.removed = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self.updated = v

    def remove(self):
        self.removed = True

    def setTimeoutTimestamp(self, ts):
        self.timeout_ts = ts

    def getCurrentWatermarkMs(self):
        return 0


def _run(rows, state_tuple=None, gap=1800):
    ts0 = dt.datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {
            "ts": [ts0 + dt.timedelta(seconds=s) for s, _ in rows],
            "value": [v for _, v in rows],
        }
    )
    state = _FakeState(state_tuple)
    out = list(_sessionize_fn(gap)((7,), iter([pdf]), state))
    closed = pd.concat(out) if out else pd.DataFrame()
    return closed, state.updated


def test_sessionize_gap_boundary_is_strict():
    # gaps of exactly `gap` seconds do NOT break; gap+1 does
    closed, carried = _run([(0, 1.0), (1800, 1.0), (3601, 1.0)])
    assert len(closed) == 1  # one closed session: rows 0+1800
    assert closed.iloc[0]["n_events"] == 2
    assert carried[2] == 1  # open session holds the 3601 row


def test_sessionize_state_merges_adjacent_batch():
    ts0 = dt.datetime(2024, 1, 1)
    prior = (ts0 - dt.timedelta(seconds=900), ts0 - dt.timedelta(seconds=900), 3, 5.0)
    closed, carried = _run([(0, 2.0)], state_tuple=prior)
    assert len(closed) == 0  # bridge gap 900 <= 1800: merged, stays open
    assert carried[2] == 4 and carried[3] == 7.0


def test_sessionize_state_closes_when_batch_is_far():
    ts0 = dt.datetime(2024, 1, 1)
    prior = (ts0 - dt.timedelta(seconds=4000), ts0 - dt.timedelta(seconds=4000), 2, 1.0)
    closed, carried = _run([(0, 1.0)], state_tuple=prior)
    assert len(closed) == 1 and closed.iloc[0]["n_events"] == 2
    assert carried[2] == 1  # new open session = the batch row


@given(
    st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=64),
    st.sampled_from([8000, 12000, 16000, 44100]),
)
@settings(max_examples=50, deadline=None)
def test_wav_encoder_decoder_roundtrip(samples, rate):
    """The m06 WAV encoder round-trips through the real decoder: the
    reported rate matches, the duration is n/rate, and the RMS equals the
    normalized samples' RMS (numpy double arithmetic both ways)."""
    import numpy as np

    from agentic_etl_poc_spark.operators.multimodal import (
        _decode_audio_real,
        _wav_pcm16,
    )

    payload = _wav_pcm16(np.array(samples, dtype=np.int64), rate)
    duration, got_rate, rms = _decode_audio_real(payload)
    assert got_rate == rate
    assert duration == len(samples) / float(rate)
    expect = float(
        np.sqrt(np.mean((np.array(samples, dtype=np.float64) / 32768.0) ** 2))
    )
    assert rms == expect


@given(st.integers(min_value=0, max_value=3), st.integers(min_value=0, max_value=2))
@settings(max_examples=20, deadline=None)
def test_parquet_pieces_enumerates_files_and_row_groups(tmp_path_factory, n_files, rgs_per_file):
    """_piece_row_groups flattens (file, row_group) units across a
    directory dataset in sorted-file order; a single file degenerates to
    its own row groups; zero-row-group files contribute nothing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from agentic_etl_poc_spark.sources.py_datasource import (
        _parquet_pieces,
        _piece_row_groups,
    )

    d = tmp_path_factory.mktemp("ds")
    for i in range(n_files):
        path = str(d / f"part-{i}.parquet")
        schema = pa.schema([("doc_id", pa.int64()), ("lang", pa.string()),
                            ("source", pa.string()), ("n_chars", pa.int64())])
        with pq.ParquetWriter(path, schema) as w:
            for _ in range(rgs_per_file):
                w.write_table(pa.table({"doc_id": pa.array([1], pa.int64()),
                                        "lang": pa.array(["en"]),
                                        "source": pa.array(["s"]),
                                        "n_chars": pa.array([1], pa.int64())}))
    pieces = _parquet_pieces(str(d))
    assert pieces == sorted(pieces) and len(pieces) == n_files
    units = _piece_row_groups(str(d))
    assert len(units) == n_files * rgs_per_file
    assert [u for u in units] == [
        (p, rg) for p in pieces for rg in range(rgs_per_file)
    ]
