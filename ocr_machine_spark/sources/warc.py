"""WARC ingest — the wire format a Common-Crawl-style corpus arrives in.

The engine's pages table (url, warc_ts, html, …) is downstream of web
archives; this source closes the gap: WARC/1.0 files (ISO 28500) → the
pages-table shape, so a user can point the extraction job at raw crawl
output. Reference twin: the S3 document-ingest stage of the reference's
flow (SURVEY.md §2 S-tier) — its inputs are scanned PDFs in a bucket,
ours are crawl archives.

Format support (documented subset, strict errors outside it):
* WARC/1.0 records, uncompressed or **gzip-per-record** (the Common
  Crawl convention: each record its own gzip member, so readers can
  stream without decompressing the whole file);
* ``response`` records become rows; ``warcinfo``/``request``/``metadata``
  records are structural and skipped;
* the HTTP payload is split at its header/body boundary: status code and
  Content-Type come from the response head, ``html`` is the raw body
  bytes (charset sniffing happens later, in core.extract — ingest never
  decodes).

Scale shape: one WARC file = one task (``binaryFile`` row) = one
streaming parse — records are yielded one at a time and re-batched, so
task memory is O(file + one Arrow batch), the standard Common-Crawl
processing grain (~1 GB gz files, parallelism = file count). No shuffle
anywhere: ingest is a pure mapInArrow projection; partitioning for
downstream joins happens in extract_pages' salted repartition.
"""

from __future__ import annotations

import gzip
import io
import zlib
from collections.abc import Iterator
from datetime import datetime

CRLF2 = b"\r\n\r\n"


def _http_date(ts: datetime) -> str:
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def encode_warc_record(
    url: str,
    warc_ts: datetime,
    body: bytes,
    *,
    status: int = 200,
    mime: str = "text/html",
    record_id: str | None = None,
) -> bytes:
    """One WARC/1.0 ``response`` record (uncompressed) — the fixture/test
    encoder twin of ``iter_warc_records`` (same role as encode_jpeg for the
    JPEG decoder: by-construction inputs, no third-party writer)."""
    http_head = (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {mime}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("ascii")
    payload = http_head + body
    # md5, not hash(): Python's hash is salted per process and would make
    # fixture bytes (and so gz member lengths / CDX offsets) irreproducible
    import hashlib

    rid = record_id or f"<urn:uuid:{hashlib.md5(f'{url}|{len(body)}'.encode()).hexdigest()}>"
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: {rid}\r\n"
        f"WARC-Date: {_http_date(warc_ts)}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("ascii")
    return head + payload + CRLF2


def encode_warcinfo(filename: str) -> bytes:
    """A leading ``warcinfo`` record (real WARCs always carry one — the
    parser must skip it, and the fixtures make sure it does)."""
    body = f"software: ocr-machine-spark\r\nisPartOf: {filename}\r\n".encode("ascii")
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: warcinfo\r\n"
        "WARC-Record-ID: <urn:uuid:0>\r\n"
        "WARC-Date: 2024-01-01T00:00:00Z\r\n"
        "Content-Type: application/warc-fields\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("ascii")
    return head + body + CRLF2


def _gzip_member(record: bytes) -> bytes:
    # mtime pinned so fixture bytes are deterministic
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(record)
    return buf.getvalue()


def encode_warc_file(records: list[bytes], *, per_record_gzip: bool = False) -> bytes:
    """Concatenate encoded records into a .warc (plain) or .warc.gz
    (member-per-record, the Common Crawl layout) byte stream."""
    if per_record_gzip:
        return b"".join(_gzip_member(r) for r in records)
    return b"".join(records)


def _iter_plain(data: bytes) -> Iterator[tuple[int, int, bytes]]:
    """Yield (offset, length, raw) record spans from uncompressed WARC —
    offset/length cover the record INCLUDING its trailing CRLF pair, so
    ``data[offset:offset+length]`` re-parses standalone (the CDX random-
    access contract)."""
    pos, n = 0, len(data)
    while pos < n:
        start = pos
        if data[pos:pos + 5] != b"WARC/":
            raise ValueError(f"WARC record sync lost at offset {pos}")
        hdr_end = data.find(CRLF2, pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC header")
        headers = data[pos:hdr_end].decode("ascii", "replace")
        clen = None
        for line in headers.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            if k.strip().lower() == "content-length":
                clen = int(v.strip())
        if clen is None:
            raise ValueError("WARC record missing Content-Length")
        body_start = hdr_end + 4
        body_end = body_start + clen
        if body_end > n:
            raise ValueError("truncated WARC payload")
        # two CRLFs close a record; tolerate EOF right after the payload
        pos = body_end
        while data[pos:pos + 2] == b"\r\n":
            pos += 2
        yield start, pos - start, data[start:body_end]


# Per-member inflation cap: a crafted or corrupt .warc.gz member that
# inflates to many GB must fail the record, not OOM the executor (same
# defense as decode_png's IHDR-bounded inflate). 256 MiB is ~100× the
# largest real-world WARC response record; override per call if an
# archive legitimately exceeds it.
MAX_INFLATED_MEMBER = 1 << 28


def _iter_members(
    data: bytes, *, max_member_bytes: int = MAX_INFLATED_MEMBER
) -> Iterator[tuple[int, int, bytes]]:
    """Yield (offset, compressed_length, member) gzip members one at a time
    (streaming — never inflate the whole file at once). The compressed span
    is what a CDX index stores for .warc.gz: readers range-request exactly
    those bytes and gunzip one member.

    Fed in bounded chunks off a zero-copy memoryview: handing the
    decompressor ``data[pos:]`` per member would memcpy the remaining file
    twice per member (the slice and ``unused_data``) — O(members·filesize)
    byte traffic on a 50k-member production archive. Chunking bounds the
    per-member overshoot copy to one chunk."""
    mv = memoryview(data)
    pos, n = 0, len(data)
    chunk_sz = 1 << 20
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        out: list[bytes] = []
        fed = 0
        produced = 0
        while not d.eof:
            if pos + fed >= n:
                raise ValueError("truncated gzip member in .warc.gz")
            chunk = mv[pos + fed : pos + fed + chunk_sz]
            try:
                # max_length bounds the inflate: one byte past the cap is
                # enough to detect overflow without materializing it
                piece = d.decompress(chunk, max_member_bytes + 1 - produced)
            except zlib.error as exc:
                # corrupt member / trailing garbage between members: keep
                # the module's ValueError taxonomy (callers catch it per
                # test_error_taxonomy; a raw zlib.error would escape)
                raise ValueError(f"bad gzip member at offset {pos}: {exc}") from exc
            produced += len(piece)
            if produced > max_member_bytes:
                raise ValueError(
                    f"gzip member at offset {pos} exceeds size cap "
                    f"({max_member_bytes} bytes inflated)"
                )
            # cap not hit → the decompressor consumed the whole chunk
            # (unconsumed_tail is only non-empty when max_length stopped it)
            out.append(piece)
            fed += len(chunk)
        consumed = fed - len(d.unused_data)
        yield pos, consumed, b"".join(out)
        pos += consumed


def _record_spans(
    data: bytes, *, require_member_per_record: bool = False
) -> Iterator[tuple[int, int, bytes]]:
    """(offset, length, raw-record) for plain or gzip WARC bytes. For .gz
    the span is the compressed MEMBER (one record per member, the Common
    Crawl layout); for plain it is the record's own byte range.

    ``require_member_per_record``: a gzip member holding several records
    (e.g. ``gzip file.warc`` over a whole archive) has NO per-record
    compressed span — consumers that publish spans (CDX) must raise rather
    than silently emit the member span for every record (a corrupt
    url→offset map); record-level readers just keep streaming."""
    if data[:2] == b"\x1f\x8b":
        for moff, mlen, member in _iter_members(data):
            recs = list(_iter_plain(member))
            if require_member_per_record and len(recs) > 1:
                raise ValueError(
                    "gzip WARC is not member-per-record "
                    f"(member at offset {moff} holds {len(recs)} records): "
                    "CDX offsets are undefined for this layout"
                )
            for _, _, raw in recs:
                yield moff, mlen, raw
    else:
        yield from _iter_plain(data)


def _parse_response(raw: bytes) -> dict | None:
    """One raw record → response dict, or None for structural records
    (warcinfo/request/metadata)."""
    hdr_end = raw.find(CRLF2)
    fields: dict[str, str] = {}
    for line in raw[:hdr_end].decode("ascii", "replace").split("\r\n")[1:]:
        k, _, v = line.partition(":")
        fields[k.strip().lower()] = v.strip()
    if fields.get("warc-type") != "response":
        return None
    payload = raw[hdr_end + 4:]
    http_end = payload.find(CRLF2)
    if http_end < 0:
        raise ValueError("WARC response payload is not HTTP (no header end)")
    head_lines = payload[:http_end].decode("ascii", "replace").split("\r\n")
    try:
        status = int(head_lines[0].split(" ", 2)[1])
    except (IndexError, ValueError) as exc:
        raise ValueError(f"bad HTTP status line: {head_lines[0]!r}") from exc
    mime = ""
    for line in head_lines[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "content-type":
            mime = v.strip().split(";", 1)[0].strip()
    if "warc-date" not in fields:
        raise ValueError("WARC response record missing WARC-Date")
    return {
        "url": fields.get("warc-target-uri", ""),
        "warc_ts": datetime.strptime(fields["warc-date"], "%Y-%m-%dT%H:%M:%SZ"),
        "status": status,
        "mime": mime,
        "html": payload[http_end + 4:],
    }


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """WARC file bytes (plain or member-per-record gzip) → one dict per
    ``response`` record: url, warc_ts (naive UTC datetime — the pages-table
    convention), status, mime, html (raw body bytes)."""
    for _, _, raw in _record_spans(data):
        rec = _parse_response(raw)
        if rec is not None:
            yield rec


def iter_warc_cdx(data: bytes) -> Iterator[dict]:
    """CDX rows for one WARC file: (url, offset, length, digest, status,
    mime) per response record — the Common-Crawl-style random-access index
    entry. ``offset``/``length`` are the compressed member span for .gz
    input (range-request + gunzip one member) or the record's own byte
    range for plain input; ``digest`` is md5 hex over the raw body. A gzip
    archive that is NOT member-per-record raises (its records have no
    compressed span — silently indexing the member span would corrupt the
    url→offset map); use ``iter_warc_records`` for span-free ingest of
    that layout."""
    import hashlib

    for off, length, raw in _record_spans(data, require_member_per_record=True):
        rec = _parse_response(raw)
        if rec is None:
            continue
        yield {
            "url": rec["url"],
            "offset": off,
            "length": length,
            "digest": hashlib.md5(rec["html"]).hexdigest(),
            "status": rec["status"],
            "mime": rec["mime"],
        }


def read_warc(spark, path: str):
    """WARC files under ``path`` → DataFrame(url, warc_ts, status, mime,
    html) — the pages-table ingest head. One binaryFile row per WARC; the
    parse is a streaming mapInArrow stage (zero per-row Python in the
    Spark sense: Arrow-batched, no shuffle)."""
    import pyarrow as pa

    out_pa = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("status", pa.int32()),
            ("mime", pa.string()),
            ("html", pa.binary()),
        ]
    )

    def parse(batches):
        rows: list[dict] = []
        for batch in batches:
            contents = batch.column(batch.schema.get_field_index("content"))
            for blob in contents:
                for rec in iter_warc_records(blob.as_py()):
                    rows.append(rec)
                    if len(rows) >= 256:
                        yield pa.RecordBatch.from_pylist(rows, schema=out_pa)
                        rows = []
        if rows:
            yield pa.RecordBatch.from_pylist(rows, schema=out_pa)

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInArrow(
        parse, "url string, warc_ts timestamp_ntz, status int, mime string, html binary"
    )


def read_warc_cdx(spark, path: str):
    """WARC files under ``path`` → CDX index DataFrame(file, url, offset,
    length, digest, status, mime) — the random-access map over archives
    (Common Crawl's cdx-index artifact): readers range-request
    [offset, offset+length) of ``file`` and gunzip/parse one record. Same
    pure-map shape as read_warc; building the index never shuffles."""
    import os

    import pyarrow as pa

    out_pa = pa.schema(
        [
            ("file", pa.string()),
            ("url", pa.string()),
            ("offset", pa.int64()),
            ("length", pa.int64()),
            ("digest", pa.string()),
            ("status", pa.int32()),
            ("mime", pa.string()),
        ]
    )

    def parse(batches):
        rows: list[dict] = []
        for batch in batches:
            paths = batch.column(batch.schema.get_field_index("path"))
            contents = batch.column(batch.schema.get_field_index("content"))
            for pth, blob in zip(paths, contents):
                fname = os.path.basename(pth.as_py())
                for row in iter_warc_cdx(blob.as_py()):
                    rows.append({"file": fname, **row})
                    if len(rows) >= 1024:
                        yield pa.RecordBatch.from_pylist(rows, schema=out_pa)
                        rows = []
        if rows:
            yield pa.RecordBatch.from_pylist(rows, schema=out_pa)

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInArrow(
        parse,
        "file string, url string, offset long, length long, "
        "digest string, status int, mime string",
    )


def fetch_record_at(path: str, offset: int, length: int) -> dict | None:
    """The CDX random-access read contract, as one call: range-read
    ``[offset, offset+length)`` of ``path``, gunzip if the span is a gzip
    member, parse exactly one WARC record. Returns the response dict
    (url, warc_ts, status, mime, html) or None for a non-response record.
    Raises ValueError for truncated ranges / corrupt members (the module's
    taxonomy), with the same per-member inflation cap as ingest."""
    with open(path, "rb") as f:
        return _parse_span(f, path, offset, length)


def _parse_span(f, path: str, offset: int, length: int) -> dict | None:
    """Range-read + parse one record from an already-open file handle —
    the per-file batch path of fetch_by_url (one open per file per batch)."""
    f.seek(offset)
    blob = f.read(length)
    if len(blob) != length:
        raise ValueError(
            f"truncated range read at {path}:{offset}+{length} (got {len(blob)})"
        )
    if blob[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            raw = d.decompress(blob, MAX_INFLATED_MEMBER + 1)
        except zlib.error as exc:
            raise ValueError(f"bad gzip member at {path}:{offset}: {exc}") from exc
        if len(raw) > MAX_INFLATED_MEMBER:
            raise ValueError(
                f"gzip member at {path}:{offset} exceeds size cap "
                f"({MAX_INFLATED_MEMBER} bytes inflated)"
            )
    else:
        raw = blob
    # frame the record with the normal parser: spans include the trailing
    # record CRLFs (both layouts), which _iter_plain trims by Content-Length
    # — handing the untrimmed blob straight to _parse_response would leak
    # those 4 bytes into the body. Default-guarded next(): a span that
    # frames to zero records (length-0 CDX row, empty inflated member) must
    # raise the module's ValueError, not StopIteration — PEP 479 would turn
    # that into an opaque RuntimeError inside fetch_by_url's Arrow generator
    first = next(iter(_iter_plain(raw)), None)
    if first is None:
        raise ValueError(f"empty record span at {path}:{offset}+{length}")
    return _parse_response(first[2])


def fetch_by_url(spark, cdx, warc_dir: str, urls=None):
    """CDX consumer — fetch documents back out of the archives by url:
    resolve urls against the index, then range-read + parse exactly the
    addressed records. → DataFrame(url, status, mime, html).

    ``urls``: a list of url strings or a DataFrame with a ``url`` column;
    None fetches every indexed record. The request set semi-joins the
    index (broadcast when small — the common lookup shape; AQE degrades to
    a shuffled semi for giant request lists), so only matching index rows
    ever reach the fetch stage.

    Scale shape: the fetch is a pure Arrow-batched map over index rows —
    no shuffle; within a batch reads are grouped per file and ordered by
    offset (sequential-ish I/O, one open per file per batch). Against an
    object store each (file, offset, length) becomes one range request —
    the Common Crawl access pattern; the index side is a url-sorted
    parquet, so predicate pushdown prunes row groups before any I/O."""
    import os

    import pyarrow as pa
    from pyspark.sql import functions as F

    sel = cdx
    if urls is not None:
        if isinstance(urls, (list, tuple)):
            # a Python list is bounded BY CONSTRUCTION (the caller already
            # holds it in driver memory), so broadcast it explicitly (r7,
            # VERDICT r6 #1): without the hint the planner's estimates put
            # the parsed CDX side through a SortMergeJoin LeftSemi Exchange
            # — a full index shuffle to serve a handful of urls; AQE only
            # demotes that after the index's shuffle map stage has already
            # run. Plan now builds the hash relation from the url set and
            # never exchanges the index (plans/r07/warc_fetch_by_url_after).
            req = spark.createDataFrame([(u,) for u in urls], "url string")
            sel = cdx.join(F.broadcast(req.distinct()), "url", "left_semi")
        else:
            # DataFrame request sets keep the no-hint policy: AQE broadcasts
            # a small set at runtime, but a forced hint is never demoted —
            # a 10^8-row request DataFrame must degrade to a shuffled semi-
            # join, not OOM the driver (the bm25_topk / robots_check policy)
            req = urls.select("url")
            sel = cdx.join(req.distinct(), "url", "left_semi")

    out_pa = pa.schema(
        [
            ("url", pa.string()),
            ("status", pa.int32()),
            ("mime", pa.string()),
            ("html", pa.binary()),
        ]
    )

    def run(batches):
        for batch in batches:
            rows = batch.to_pylist()
            rows.sort(key=lambda r: (r["file"], r["offset"]))
            out: list[dict] = []
            fh, fh_name = None, None
            try:
                for r in rows:
                    if r["file"] != fh_name:
                        if fh is not None:
                            fh.close()
                        fh_name = r["file"]
                        # reject path components (ADVICE r6): read_warc_cdx
                        # writes basenames, so an externally-supplied index
                        # row carrying '../' or an absolute path is
                        # malformed input, not a file to open outside
                        # warc_dir
                        if os.path.basename(fh_name) != fh_name:
                            raise ValueError(
                                f"CDX 'file' must be a bare archive name, got {fh_name!r}"
                            )
                        fh = open(os.path.join(warc_dir, fh_name), "rb")
                    rec = _parse_span(fh, fh_name, r["offset"], r["length"])
                    if rec is None:
                        continue
                    out.append(
                        {
                            "url": rec["url"],
                            "status": rec["status"],
                            "mime": rec["mime"],
                            "html": rec["html"],
                        }
                    )
                    if len(out) >= 256:
                        yield pa.RecordBatch.from_pylist(out, schema=out_pa)
                        out = []
            finally:
                if fh is not None:
                    fh.close()
            if out:
                yield pa.RecordBatch.from_pylist(out, schema=out_pa)

    return sel.select("file", "url", "offset", "length").mapInArrow(
        run, "url string, status int, mime string, html binary"
    )


# Fixture-format version for warc_fixture's golden cache path. Kept at the
# round-6 value VERBATIM: the path is embedded in oracle_sql() text, which is
# fingerprinted across rounds — and the generator's output is unchanged, so
# the cached goldens under this tag remain exactly what the generator
# produces. Bump only when the fixture bytes / golden rows change.
WARC_FIXTURE_TAG = "870d1b372f"


def warc_fixture(
    n: int, seed: int = 42, base_dir: str = "/tmp/ocr_machine_spark_goldens"
) -> tuple[str, str]:
    """By-construction WARC fixture: pages [0, n) written as TWO archive
    files — part-0.warc (plain, even i) and part-1.warc.gz (member-per-
    record gzip, odd i), each led by a warcinfo record the parser must
    skip — plus a golden parquet of the expected ingest rows (url,
    ts_epoch, status, mime, html_md5, n_bytes, and the CDX triple
    file/offset/length tracked by write-side cursors, never by re-parsing).
    Status/mime vary by construction so the HTTP-head parse is actually
    exercised. Cache tag = WARC_FIXTURE_TAG, a pinned fixture-FORMAT
    version (r7): the tag used to be a hash of this whole module's source,
    but the golden path rides inside oracle_sql() — whose text is
    fingerprinted across rounds — so an edit to a pure CONSUMER
    (fetch_by_url) must not move the goldens of an unchanged generator.
    Bump the constant if and only if the fixture bytes/golden rows this
    function produces change (the parser-vs-golden pytest gates catch a
    missed bump: stale goldens no longer match the parser under test).
    Returns (warc_dir, golden_path)."""
    import hashlib
    import os
    from datetime import timezone

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_machine_spark.fixtures import make_page

    root = os.path.join(base_dir, f"warc_fixture_{WARC_FIXTURE_TAG}_n{n}_s{seed}")
    warc_dir = os.path.join(root, "warcs")
    golden = os.path.join(root, "golden.parquet")
    if os.path.exists(golden):
        return warc_dir, golden
    os.makedirs(warc_dir, exist_ok=True)

    fnames = {0: "part-0.warc", 1: "part-1.warc.gz"}
    files: dict[int, list[bytes]] = {0: [encode_warcinfo(fnames[0])], 1: [encode_warcinfo(fnames[1])]}
    # by-construction CDX cursors: plain file offsets advance by raw record
    # length, gz offsets by the compressed member length — computed while
    # WRITING, never by re-parsing (the golden must be independent of the
    # parser under test)
    cursors = {0: len(files[0][0]), 1: len(_gzip_member(files[1][0]))}
    g: dict[str, list] = {
        k: []
        for k in (
            "url", "ts_epoch", "status", "mime", "html_md5", "n_bytes",
            "file", "offset", "length",
        )
    }
    for i in range(n):
        p = make_page(i, seed)
        ts = datetime.fromtimestamp(p.warc_ts, tz=timezone.utc).replace(tzinfo=None)
        status = 404 if i % 11 == 3 else 200
        mime = "application/octet-stream" if i % 13 == 5 else "text/html"
        rec = encode_warc_record(p.url, ts, p.html, status=status, mime=mime)
        f = i % 2
        files[f].append(rec)
        span = len(rec) if f == 0 else len(_gzip_member(rec))
        g["url"].append(p.url)
        g["ts_epoch"].append(int(p.warc_ts))
        g["status"].append(status)
        g["mime"].append(mime)
        g["html_md5"].append(hashlib.md5(p.html).hexdigest())
        g["n_bytes"].append(len(p.html))
        g["file"].append(fnames[f])
        g["offset"].append(cursors[f])
        g["length"].append(span)
        cursors[f] += span

    with open(os.path.join(warc_dir, "part-0.warc"), "wb") as f:
        f.write(encode_warc_file(files[0]))
    with open(os.path.join(warc_dir, "part-1.warc.gz"), "wb") as f:
        f.write(encode_warc_file(files[1], per_record_gzip=True))
    tbl = pa.Table.from_pydict(
        g,
        schema=pa.schema(
            [
                ("url", pa.string()),
                ("ts_epoch", pa.int64()),
                ("status", pa.int32()),
                ("mime", pa.string()),
                ("html_md5", pa.string()),
                ("n_bytes", pa.int64()),
                ("file", pa.string()),
                ("offset", pa.int64()),
                ("length", pa.int64()),
            ]
        ),
    )
    tmp = golden + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, golden)
    return warc_dir, golden
