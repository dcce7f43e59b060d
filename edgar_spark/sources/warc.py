"""WARC-style record source — bulk web-archive ingestion.

A web-scale corpus arrives as WARC files (Common Crawl's format): records
concatenated per file, each a ``WARC/1.0`` header block, a blank line,
then EXACTLY ``Content-Length`` characters of payload, then a blank-line
record separator. The payload can contain anything — including the magic
string — so the ONLY correct parser walks Content-Length offsets; naive
splitting on the magic corrupts records (the reference never faces this:
it fetches one document per HTTP response, page.go:21-28).

The reader is a ``mapInPandas`` Arrow kernel (same pattern as the HTML
parse kernels, operators/udfs.py): per-file sequential offset walk in
Python — inherently stateful within a file, embarrassingly parallel
across files, which is exactly WARC's design (files are the parallelism
unit; Common Crawl ships ~10^5 of them per snapshot). No shuffle: one
scan, records explode out of their file rows.

This module works on STR payloads (the corpus text column) but
Content-Length counts OCTETS of the UTF-8 encoding, as the WARC spec
requires — ``F.octet_length`` on the writer, a byte-offset walk in the
parser (DuckDB mirrors it with ``strlen``). Files written here slice
correctly in external WARC readers for any payload, not just ASCII.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "encode_warc_entry",
    "parse_warc_text",
    "parse_warc",
    "write_warc",
    "revisit_records",
    "write_warc_records",
]

_MAGIC = "WARC/1.0\r\n"
_SEP = "\r\n\r\n"
_BMAGIC = _MAGIC.encode("ascii")
_BSEP = _SEP.encode("ascii")

_WARC_OUT = StructType(
    [
        StructField("file_id", StringType()),
        StructField("rec_idx", IntegerType()),
        StructField("target_uri", StringType()),
        StructField("content_length", LongType()),
        StructField("payload", StringType()),
    ]
)


def encode_warc_entry(uri: str, payload: str) -> str:
    """One response record: header block, blank line, payload, separator.
    Content-Length is the UTF-8 OCTET count of the payload (WARC spec),
    not the character count."""
    return (
        f"{_MAGIC}WARC-Type: response\r\nWARC-Target-URI: {uri}\r\n"
        f"Content-Length: {len(payload.encode('utf-8'))}{_SEP}{payload}{_SEP}"
    )


def parse_warc_text(data: str) -> list[tuple[str, int, str]]:
    """Walk one WARC file: [(target_uri, content_length, payload), ...].

    Content-Length counts UTF-8 octets and drives every payload slice —
    the walk happens over the encoded bytes, so a payload containing
    ``WARC/1.0`` or multi-byte characters parses correctly and files
    from external WARC writers slice at the right offsets. Malformed
    trailing bytes (including a Content-Length that splits a multi-byte
    sequence) end the walk; complete records are kept — truncated
    transfers are normal.
    """
    out = []
    raw = data.encode("utf-8")
    i = 0
    n = len(raw)
    while i < n:
        if not raw.startswith(_BMAGIC, i):
            break
        hdr_end = raw.find(_BSEP, i)
        if hdr_end < 0:
            break
        header = raw[i + len(_BMAGIC) : hdr_end].decode("utf-8", "replace")
        uri, clen = None, None
        for line in header.split("\r\n"):
            k, _, v = line.partition(":")
            k = k.strip().lower()
            if k == "warc-target-uri":
                uri = v.strip()
            elif k == "content-length":
                try:
                    clen = int(v.strip())
                except ValueError:
                    clen = None
        body_start = hdr_end + len(_BSEP)
        if uri is None or clen is None or clen < 0 or body_start + clen > n:
            break
        try:
            payload = raw[body_start : body_start + clen].decode("utf-8")
        except UnicodeDecodeError:
            break
        out.append((uri, clen, payload))
        i = body_start + clen + len(_BSEP)
    return out


def write_warc(
    df: DataFrame,
    n_files: int = 4,
    url_col: str = "url",
    payload_col: str = "payload",
) -> DataFrame:
    """WARC WRITER sink — the inverse of ``parse_warc``: pages shard
    deterministically by md5(url) into ``n_files`` WARC files, records
    within a file sorted by url, each rendered with the exact
    ``encode_warc_entry`` layout (WARC-Type / WARC-Target-URI /
    Content-Length header, blank line, payload, separator). Output:
    (file_id BIGINT, data STRING).

    Entirely JVM column expressions — the entry renders in codegen and
    the only shuffle is the per-file collect_list; ``n_files`` is the
    parallelism/size knob (Common Crawl ships ~10^5 ≈1 GB files per
    snapshot — size shards so one file's records fit an executor,
    which is also what keeps the collect_list bounded). Roundtrip
    ``parse_warc(write_warc(pages))`` is the identity on (url, payload)
    — the ``warc_roundtrip`` driver key pins it value-exactly."""
    return _pack_warc(df, _response_entry(url_col, payload_col),
                      n_files, url_col)


def _response_entry(url_col: str, payload_col: str):
    """The response-record render Column — ONE definition shared by
    ``write_warc`` and ``write_warc_records`` so the framing (the thing
    the octet-length fix touched) cannot diverge between writers."""
    from pyspark.sql import functions as F

    return F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        F.col(url_col),
        F.lit("\r\nContent-Length: "),
        F.octet_length(payload_col).cast("string"),
        F.lit("\r\n\r\n"),
        F.col(payload_col),
        F.lit("\r\n\r\n"),
    )


def _pack_warc(df: DataFrame, entry, n_files: int, url_col: str) -> DataFrame:
    """Shared shard-and-pack stage: md5(url) shard id, url-sorted records
    within a file, one collect_list shuffle. Output (file_id, data)."""
    from pyspark.sql import functions as F

    fid = F.pmod(
        F.conv(F.substring(F.md5(F.col(url_col)), 1, 15), 16, 10).cast("long"),
        F.lit(n_files),
    )
    return (
        df.select(
            fid.alias("file_id"),
            F.struct(F.col(url_col).alias("u"), entry.alias("e")).alias("_s"),
        )
        .groupBy("file_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("_s")), lambda s: s["e"]),
                "",
            ).alias("data")
        )
    )


def parse_warc(
    df: DataFrame, data_col: str = "data", file_col: str = "file_id"
) -> DataFrame:
    """Explode WARC files into records:
    (file_id, rec_idx, target_uri, content_length, payload)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for fid, data in zip(b[file_col], b[data_col]):
                if data is None:
                    continue
                # write_warc emits BIGINT file ids; the output schema is
                # string — coerce so parse(write(x)) composes directly
                if not isinstance(fid, str):
                    fid = str(fid)
                for idx, (uri, clen, payload) in enumerate(
                    parse_warc_text(data)
                ):
                    rows.append((fid, idx, uri, clen, payload))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _WARC_OUT.fields]
            )

    return df.select(file_col, data_col).mapInPandas(gen, _WARC_OUT)


def revisit_records(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    payload_col: str = "payload",
) -> DataFrame:
    """WARC 1.1 §6.7.2 ``identical-payload-digest`` dedup — the archive-
    level twin of `frontier.schedule.conditional_fetch`: when a capture's
    payload digest matches an earlier capture, the archive stores a
    bodyless *revisit* record pointing at the original instead of the
    bytes again (how Common Crawl / IA keep recrawl snapshots from
    storing every unchanged page twice).

    Within each payload-digest group the earliest capture (by ``ts``,
    ties by url) stays a full ``response``; every later capture becomes
    a ``revisit`` with ``refers_to_uri``/``refers_to_ts`` naming the
    original and a NULL payload (the body is not stored). Note the
    group key is the DIGEST, not the url — identical bytes served from
    two urls dedup across urls, exactly as the profile allows.

    Output: (url, ts, rec_type, digest, refers_to_uri, refers_to_ts,
    payload). Plan: ONE window shuffle on the digest key (first-row pick
    + first_value ride the same partitioning); md5 here stands in for
    the spec's sha1 under the engine's replayable-hash convention.

    Bodyless captures (NULL payload — fetch failures) are EXCLUDED:
    md5(NULL) is NULL and a NULL digest group would mark arbitrary
    failed captures as revisits of each other (and render as NULL
    entries that array_join silently drops). Failures are not archive
    records — route them through `frontier.schedule.failure_backoff` /
    `conditional_fetch` instead.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("_dig").orderBy(ts_col, url_col)
    first = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base = captures.filter(F.col(payload_col).isNotNull()).select(
        url_col,
        F.col(ts_col).cast("long").alias(ts_col),
        payload_col,
        F.md5(F.col(payload_col)).alias("_dig"),
    )
    ranked = base.select(
        url_col,
        ts_col,
        payload_col,
        "_dig",
        F.row_number().over(w).alias("_rn"),
        F.first(url_col).over(first).alias("_ru"),
        F.first(ts_col).over(first).alias("_rt"),
    )
    is_rev = F.col("_rn") > 1
    return ranked.select(
        url_col,
        ts_col,
        F.when(is_rev, "revisit").otherwise("response").alias("rec_type"),
        F.col("_dig").alias("digest"),
        F.when(is_rev, F.col("_ru")).alias("refers_to_uri"),
        F.when(is_rev, F.col("_rt")).alias("refers_to_ts"),
        F.when(~is_rev, F.col(payload_col)).alias(payload_col),
    )


def write_warc_records(
    records: DataFrame,
    n_files: int = 4,
    url_col: str = "url",
    payload_col: str = "payload",
) -> DataFrame:
    """Render a `revisit_records` table into WARC files — response
    records with their body, revisit records as the bodyless §6.7.2
    layout (WARC-Refers-To-Target-URI / WARC-Payload-Digest headers,
    ``Content-Length: 0``). Same sharding/collect shape as
    :func:`write_warc` (md5(url) shard, url-sorted within a file, all
    rendering in codegen); ``parse_warc`` walks the mixed file correctly
    because the revisit body is exactly 0 octets."""
    from pyspark.sql import functions as F

    response = _response_entry(url_col, payload_col)
    revisit = F.concat(
        F.lit(
            "WARC/1.0\r\nWARC-Type: revisit\r\n"
            "WARC-Profile: http://netpreserve.org/warc/1.1/revisit/"
            "identical-payload-digest\r\nWARC-Target-URI: "
        ),
        F.col(url_col),
        F.lit("\r\nWARC-Refers-To-Target-URI: "),
        F.col("refers_to_uri"),
        F.lit("\r\nWARC-Refers-To-Date: "),
        F.col("refers_to_ts").cast("string"),
        F.lit("\r\nWARC-Payload-Digest: md5:"),
        F.col("digest"),
        F.lit("\r\nContent-Length: 0\r\n\r\n\r\n\r\n"),
    )
    entry = F.when(F.col("rec_type") == "revisit", revisit).otherwise(response)
    return _pack_warc(records, entry, n_files, url_col)
