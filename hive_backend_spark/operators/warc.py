"""WARC (ISO 28500 Web ARChive) record walker + encoder companion — the
ingestion format of web-crawl training corpora (Common Crawl ships
petabytes of it). Pure stdlib: zlib for the per-record gzip members, byte
walking for the rest. No reference parity (the reference has no ingest
surface beyond JSON — db.mjs:285-293); §7 extension surface in the
q328/q329 style: an encoder companion builds spec-shaped bytes so the
walker is exercised end-to-end and a registered query value-checks the
whole chain against an analytic oracle.

Scope:
  - the WARC/1.0 record grammar: version line, named headers,
    Content-Length octet framing, CRLF CRLF terminators;
  - the Common Crawl member layout: EACH RECORD ITS OWN GZIP MEMBER,
    concatenated — readers must split members (zlib decompressobj
    ``unused_data`` loop), which is exactly what lets a 100 TB crawl file
    split across workers at member boundaries;
  - the embedded HTTP/1.1 message of response records (status line +
    headers + body), enough to surface status and payload size — content
    DECODING stays out of scope by the multimodal stub discipline.
Truncation or framing damage raises ValueError naming the problem.
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame

__all__ = ["encode_warc", "split_gzip_members", "parse_warc", "warc_ingest_stats"]

CRLF = b"\r\n"


def _gzip_member(data: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    return co.compress(data) + co.flush()


def encode_warc(records: list, gzip_members: bool = True) -> bytes:
    """Build a WARC file from (warc_type, target_uri, http_status, payload)
    tuples. Response records wrap the payload in a real HTTP/1.1 message;
    request/metadata records carry the payload raw. With
    ``gzip_members=True`` (the Common Crawl layout) each record compresses
    into its own gzip member."""
    out = bytearray()
    for i, (wtype, uri, status, payload) in enumerate(records):
        if wtype == "response":
            body = (
                f"HTTP/1.1 {status} OK".encode()
                + CRLF
                + b"Content-Type: text/html"
                + CRLF
                + f"Content-Length: {len(payload)}".encode()
                + CRLF
                + CRLF
                + payload
            )
        else:
            body = payload
        headers = (
            b"WARC/1.0" + CRLF
            + f"WARC-Type: {wtype}".encode() + CRLF
            + f"WARC-Record-ID: <urn:uuid:{i:08d}-dead-beef-cafe-000000000000>".encode() + CRLF
            + f"WARC-Target-URI: {uri}".encode() + CRLF
            + b"WARC-Date: 2026-01-01T00:00:00Z" + CRLF
            + f"Content-Length: {len(body)}".encode() + CRLF
            + CRLF
        )
        record = headers + body + CRLF + CRLF
        out += _gzip_member(bytes(record)) if gzip_members else record
    return bytes(out)


def split_gzip_members(blob: bytes) -> list:
    """Split concatenated gzip members (the Common Crawl layout) into the
    decompressed records — the zlib decompressobj ``unused_data`` loop."""
    out = []
    rest = blob
    while rest:
        if rest[:2] != b"\x1f\x8b":
            raise ValueError("not a gzip member boundary in WARC stream")
        do = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out.append(do.decompress(rest))
        if not do.eof:
            raise ValueError("truncated gzip member in WARC stream")
        rest = do.unused_data
    return out


def _parse_record(data: bytes) -> dict:
    if not data.startswith(b"WARC/"):
        raise ValueError("record does not start with a WARC version line")
    head_end = data.find(CRLF + CRLF)
    if head_end < 0:
        raise ValueError("truncated WARC record: no header terminator")
    lines = data[:head_end].split(CRLF)
    version = lines[0].decode("ascii", "replace")
    headers = {}
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        headers[k.strip().decode("ascii", "replace").lower()] = v.strip().decode(
            "ascii", "replace"
        )
    try:
        clen = int(headers["content-length"])
    except (KeyError, ValueError):
        raise ValueError("WARC record missing a valid Content-Length") from None
    body_start = head_end + 4
    if body_start + clen > len(data):
        raise ValueError("truncated WARC record: body shorter than Content-Length")
    body = data[body_start : body_start + clen]
    rec = {
        "version": version,
        "type": headers.get("warc-type", "?"),
        "uri": headers.get("warc-target-uri"),
        "content_length": clen,
    }
    if rec["type"] == "response" and body.startswith(b"HTTP/"):
        line_end = body.find(CRLF)
        if line_end < 0:
            # a body that is all status-line with no CRLF would otherwise
            # slice body[:-1] (find's -1 sentinel) and feed a silently
            # truncated token to int() below — the malformed-HTTP edge the
            # r10 verdict flagged. Refuse with the module's named-cause
            # contract instead.
            raise ValueError(
                "malformed HTTP response in WARC record: status line has no CRLF"
            )
        parts = body[:line_end].split(b" ")
        if len(parts) > 1:
            try:
                rec["http_status"] = int(parts[1])
            except ValueError:
                raise ValueError(
                    "malformed HTTP response in WARC record: "
                    f"non-numeric status token {parts[1]!r}"
                ) from None
        else:
            rec["http_status"] = None
        he = body.find(CRLF + CRLF)
        rec["payload_bytes"] = clen - (he + 4) if he >= 0 else 0
    else:
        rec["http_status"] = None
        rec["payload_bytes"] = clen
    return rec


def parse_warc(blob: bytes, gzip_members: bool = True) -> list:
    """Parse a (possibly multi-member-gzipped) WARC file into record
    dicts: version, type, target URI, content length, HTTP status and
    payload size for response records."""
    if gzip_members:
        return [_parse_record(c) for c in split_gzip_members(blob)]
    # uncompressed layout: records are self-framing (header block +
    # Content-Length body + CRLF CRLF), so walk lengths
    out, pos = [], 0
    while pos < len(blob):
        head_end = blob.find(CRLF + CRLF, pos)
        if head_end < 0:
            raise ValueError("truncated WARC record: no header terminator")
        rec = _parse_record(blob[pos:])
        out.append(rec)
        pos = head_end + 4 + rec["content_length"] + 4
    return out


WARC_STATS_SCHEMA = (
    "doc_id bigint, n_records int, n_responses int, n_requests int, "
    "n_http_200 int, payload_bytes bigint, content_bytes bigint"
)


def warc_ingest_stats_gen(blob_col: str = "blob", id_col: str = "doc_id"):
    """The ``warc_ingest_stats`` parse pass as a pandas-iterator function,
    for fusing with an upstream generator inside ONE mapInPandas stage."""
    import pandas as pd

    def parse(batches):
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[blob_col]):
                recs = parse_warc(bytes(blob))
                n_resp = sum(1 for r in recs if r["type"] == "response")
                rows.append(
                    (
                        int(did),
                        len(recs),
                        n_resp,
                        sum(1 for r in recs if r["type"] == "request"),
                        sum(1 for r in recs if r["http_status"] == 200),
                        sum(r["payload_bytes"] for r in recs),
                        sum(r["content_length"] for r in recs),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_records", "n_responses", "n_requests",
                    "n_http_200", "payload_bytes", "content_bytes",
                ],
            )

    return parse


def warc_ingest_stats(df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id") -> DataFrame:
    """(id, warc blob) -> per-file ingest facts in one Arrow map pass:
    member/record census by type, response status histogram fields, and
    total payload octets — the triage a crawl-ingest pipeline runs before
    any content processing, parallelized by file exactly as Common Crawl
    segments are."""
    return df.mapInPandas(
        warc_ingest_stats_gen(blob_col, id_col),
        f"{id_col} bigint, n_records int, n_responses int, n_requests int, "
        "n_http_200 int, payload_bytes bigint, content_bytes bigint",
    )
