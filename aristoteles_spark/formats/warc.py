"""Pure-Python WARC 1.1 (ISO 28500) writer + reader.

WARC is the container web-scale text corpora actually arrive in
(Common Crawl ships WARC/WET). Structure per record:

    WARC/1.1\\r\\n
    <header-name>: <value>\\r\\n ...
    \\r\\n
    <Content-Length bytes of payload>
    \\r\\n\\r\\n

Compressed WARC files are a CONCATENATION of independent gzip members,
one per record — the property that makes a 100 TB crawl splittable:
a reader can start at any member boundary, and record offsets index
into the file. The reader here handles plain and member-gzip files
(via zlib's unused_data loop) and verifies Content-Length framing.

Used by ``queries/io_formats.py:io11_warc_roundtrip`` — distributed
write (one WARC shard per task) and distributed read (binaryFile +
Arrow-batched parse), mirroring how WET extraction jobs consume crawls.

Reference scope note: the reference ingests only SQLite
(aristoteles/aristoteles.py:318-343); this serves the engine's
landing-zone surface (SURVEY.md §7.4). All structure from the public
ISO 28500 / WARC 1.1 specification; no code derived from warcio or any
other WARC library.
"""

from __future__ import annotations

import gzip
import io
import zlib


class WarcError(ValueError):
    pass


_CRLF = b"\r\n"


def build_record(headers: dict[str, str], payload: bytes) -> bytes:
    """One uncompressed WARC record. ``WARC-Type`` must be present;
    Content-Length is computed here."""
    if "WARC-Type" not in headers:
        raise WarcError("WARC-Type header required")
    lines = [b"WARC/1.1"]
    for k, v in headers.items():
        if "\r" in v or "\n" in v:
            raise WarcError(f"header value for {k} contains CR/LF")
        lines.append(f"{k}: {v}".encode("utf-8"))
    lines.append(f"Content-Length: {len(payload)}".encode())
    head = _CRLF.join(lines) + _CRLF + _CRLF
    return head + payload + _CRLF + _CRLF


def write_warc(
    records: list[tuple[dict[str, str], bytes]], compress: bool = True
) -> bytes:
    """Serialize records; ``compress=True`` emits one gzip member per
    record (the Common Crawl layout — splittable at member bounds)."""
    out = bytearray()
    for headers, payload in records:
        rec = build_record(headers, payload)
        if compress:
            # mtime=0: deterministic bytes (gzip headers carry a
            # timestamp otherwise)
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(rec)
            out += buf.getvalue()
        else:
            out += rec
    return bytes(out)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        out += d.decompress(data[pos:])
        out += d.flush()
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise WarcError("gzip member made no progress (corrupt)")
        pos += consumed
    return bytes(out)


def read_warc(data: bytes) -> list[tuple[dict[str, str], bytes]]:
    """Parse a WARC file (plain or member-gzip) into
    [(headers, payload)] with Content-Length-verified framing."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        end_head = data.find(_CRLF + _CRLF, pos)
        if end_head < 0:
            raise WarcError("unterminated record header block")
        head = data[pos:end_head].decode("utf-8")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise WarcError(f"bad version line {lines[0]!r}")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            if ":" not in line:
                raise WarcError(f"malformed header line {line!r}")
            k, v = line.split(":", 1)
            headers[k.strip()] = v.strip()
        try:
            clen = int(headers["Content-Length"])
        except (KeyError, ValueError) as e:
            raise WarcError("missing/invalid Content-Length") from e
        body_start = end_head + 4
        payload = data[body_start : body_start + clen]
        if len(payload) != clen:
            raise WarcError("truncated record payload")
        if data[body_start + clen : body_start + clen + 4] != _CRLF + _CRLF:
            raise WarcError("record not terminated by CRLF CRLF")
        records.append((headers, payload))
        pos = body_start + clen + 4
    return records


def conversion_record(
    uri: str, date: str, text: str, record_id: str
) -> tuple[dict[str, str], bytes]:
    """A WET-style 'conversion' record (extracted text), the form LLM
    pipelines consume."""
    payload = text.encode("utf-8")
    return (
        {
            "WARC-Type": "conversion",
            "WARC-Target-URI": uri,
            "WARC-Date": date,
            "WARC-Record-ID": f"<urn:uuid:{record_id}>",
            "Content-Type": "text/plain",
        },
        payload,
    )
