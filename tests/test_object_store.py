"""S3 footer kv stamping (sources/object_store.py) against moto's
in-process S3 — the s3a analog of the local attach_kv_metadata, the
r7-adjudicated "optional multipart-copy design" made real.

Reference anchor: parquet_reader.cc:46-47 (the --print-key-value-
metadata dump these stamps feed)."""

import io

import boto3
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from moto import mock_aws

from tmp_parquet_merge_spark.sources.object_store import (
    _parse_s3_path,
    stamp_kv_s3,
)


def _parquet_bytes(n_rows: int, *, payload: int = 0) -> bytes:
    """A real parquet blob; `payload` pads with incompressible bytes so
    tests can cross the 5 MiB multipart threshold."""
    import random

    rnd = random.Random(7)
    cols = {
        "id": pa.array(range(n_rows), pa.int64()),
        "v": pa.array([float(i) / 3 for i in range(n_rows)], pa.float64()),
    }
    if payload:
        per = payload // n_rows + 1
        cols["blob"] = pa.array(
            [rnd.randbytes(per) for _ in range(n_rows)], pa.binary()
        )
    buf = io.BytesIO()
    pq.write_table(pa.table(cols), buf, compression="snappy")
    return buf.getvalue()


@pytest.fixture()
def s3():
    with mock_aws():
        client = boto3.client("s3", region_name="us-east-1")
        client.create_bucket(Bucket="lake")
        yield client


def _roundtrip_checks(s3, key, kv, original):
    got = s3.get_object(Bucket="lake", Key=key)["Body"].read()
    md = pq.read_metadata(io.BytesIO(got))
    meta = {k.decode(): v.decode() for k, v in (md.metadata or {}).items()}
    for k, v in kv.items():
        assert meta[k] == v
    # data pages untouched: table readback identical to the original
    t_new = pq.read_table(io.BytesIO(got))
    t_old = pq.read_table(io.BytesIO(original))
    assert t_new.equals(t_old)
    # the stamp appends; it never rewrites data bytes
    assert got[: len(original)] == original
    return got


def test_small_object_stamp_roundtrip(s3):
    """< 5 MiB objects take the read-modify-put path."""
    blob = _parquet_bytes(100)
    s3.put_object(Bucket="lake", Key="t/part-0.parquet", Body=blob)
    n = stamp_kv_s3(
        "s3a://lake/t/part-0.parquet",
        {"engine": "tmp-parquet-merge-spark", "round": "9"},
        client=s3,
    )
    assert n == 1
    _roundtrip_checks(
        s3, "t/part-0.parquet", {"engine": "tmp-parquet-merge-spark"}, blob
    )


def test_large_object_multipart_copy_stamp(s3):
    """> 5 MiB objects recompose via UploadPartCopy (server-side) +
    one uploaded footer part; a tiny part_size forces several copy
    parts so the range arithmetic is exercised."""
    blob = _parquet_bytes(64, payload=12 * 1024 * 1024)
    assert len(blob) > 10 * 1024 * 1024
    s3.put_object(Bucket="lake", Key="big/part-0.parquet", Body=blob)
    n = stamp_kv_s3(
        "s3://lake/big/part-0.parquet",
        {"stamp": "multipart"},
        client=s3,
        part_size=5 * 1024 * 1024,
    )
    assert n == 1
    _roundtrip_checks(s3, "big/part-0.parquet", {"stamp": "multipart"}, blob)


def test_prefix_stamps_every_parquet_object(s3):
    blobs = {}
    for i in range(3):
        b = _parquet_bytes(50 + i)
        blobs[f"tbl/part-{i}.parquet"] = b
        s3.put_object(Bucket="lake", Key=f"tbl/part-{i}.parquet", Body=b)
    s3.put_object(Bucket="lake", Key="tbl/_SUCCESS", Body=b"")
    n = stamp_kv_s3("s3a://lake/tbl", {"k": "v"}, client=s3)
    assert n == 3
    for key, original in blobs.items():
        _roundtrip_checks(s3, key, {"k": "v"}, original)


def test_restamp_merges_and_overwrites_keys(s3):
    """Stamping twice: the second stamp sees the first stamp's footer
    (dead-bytes append), merges new keys, overwrites existing ones —
    same contract as the local attach_kv_metadata."""
    blob = _parquet_bytes(80)
    s3.put_object(Bucket="lake", Key="t/p.parquet", Body=blob)
    stamp_kv_s3("s3a://lake/t/p.parquet", {"a": "1", "b": "1"}, client=s3)
    stamp_kv_s3("s3a://lake/t/p.parquet", {"b": "2", "c": "3"}, client=s3)
    got = s3.get_object(Bucket="lake", Key="t/p.parquet")["Body"].read()
    md = pq.read_metadata(io.BytesIO(got))
    meta = {k.decode(): v.decode() for k, v in md.metadata.items()}
    assert meta["a"] == "1" and meta["b"] == "2" and meta["c"] == "3"
    assert pq.read_table(io.BytesIO(got)).equals(
        pq.read_table(io.BytesIO(blob))
    )


def test_guards(s3):
    with pytest.raises(ValueError, match="not an S3 path"):
        stamp_kv_s3("/local/path.parquet", {"k": "v"}, client=s3)
    with pytest.raises(ValueError, match="malformed"):
        _parse_s3_path("s3://bucketonly")
    with pytest.raises(ValueError, match="empty kv"):
        stamp_kv_s3("s3://lake/t.parquet", {}, client=s3)
    with pytest.raises(ValueError, match="part_size"):
        stamp_kv_s3("s3://lake/t.parquet", {"k": "v"}, client=s3, part_size=1)
    with pytest.raises(FileNotFoundError):
        stamp_kv_s3("s3://lake/absent.parquet", {"k": "v"}, client=s3)
    assert stamp_kv_s3("s3://lake/emptyprefix", {"k": "v"}, client=s3) == 0


def test_spark_and_duckdb_read_the_stamped_object(s3, tmp_path, spark):
    """The stamped bytes are a valid parquet file for OTHER engines,
    not just pyarrow: download and read with Spark and DuckDB."""
    import duckdb

    blob = _parquet_bytes(120)
    s3.put_object(Bucket="lake", Key="x/p.parquet", Body=blob)
    stamp_kv_s3("s3a://lake/x/p.parquet", {"engine": "ok"}, client=s3)
    got = s3.get_object(Bucket="lake", Key="x/p.parquet")["Body"].read()
    local = tmp_path / "stamped.parquet"
    local.write_bytes(got)
    assert spark.read.parquet(str(local)).count() == 120
    assert (
        duckdb.connect()
        .execute(f"SELECT count(*) FROM read_parquet('{local}')")
        .fetchone()[0]
        == 120
    )
    kv = (
        duckdb.connect()
        .execute(f"SELECT key, value FROM parquet_kv_metadata('{local}')")
        .fetchall()
    )
    assert (b"engine", b"ok") in [(bytes(k), bytes(v)) for k, v in kv]


def test_stamp_preserves_object_level_metadata(s3):
    """The recomposed object must carry the original's ContentType and
    x-amz-meta-* tags (both paths); dropping them — or re-encrypting
    under the bucket default — would make the 'stamp' a data change."""
    small = _parquet_bytes(60)
    big = _parquet_bytes(64, payload=12 * 1024 * 1024)
    for key, blob, ps in (
        ("m/small.parquet", small, 512 * 1024 * 1024),
        ("m/big.parquet", big, 5 * 1024 * 1024),
    ):
        s3.put_object(
            Bucket="lake",
            Key=key,
            Body=blob,
            ContentType="application/vnd.apache.parquet",
            Metadata={"team": "curation"},
        )
        stamp_kv_s3(f"s3a://lake/{key}", {"k": "v"}, client=s3, part_size=ps)
        head = s3.head_object(Bucket="lake", Key=key)
        assert head["ContentType"] == "application/vnd.apache.parquet"
        assert head["Metadata"] == {"team": "curation"}
        _roundtrip_checks(s3, key, {"k": "v"}, blob)


class _Recorder:
    """Delegating client wrapper that records (method, kwargs) of every
    call — moto accepts but does not ENFORCE IfMatch on
    CompleteMultipartUpload, so the conditional-write tests pin the
    request shape the real S3 API would enforce."""

    def __init__(self, client):
        self._c = client
        self.calls = []

    def __getattr__(self, name):
        attr = getattr(self._c, name)
        if not callable(attr):
            return attr

        def wrap(*a, **kw):
            self.calls.append((name, kw))
            return attr(*a, **kw)

        return wrap

    def kwargs(self, method):
        return [kw for n, kw in self.calls if n == method]


def test_stamp_carries_object_tags(s3):
    """r9 advisor item: object tags (TagSet) must survive the stamp on
    BOTH paths — the recompose previously re-created the object with
    an empty tag set despite the metadata-carry contract."""
    small = _parquet_bytes(60)
    big = _parquet_bytes(64, payload=12 * 1024 * 1024)
    for key, blob, ps in (
        ("g/small.parquet", small, 512 * 1024 * 1024),
        ("g/big.parquet", big, 5 * 1024 * 1024),
    ):
        s3.put_object(
            Bucket="lake", Key=key, Body=blob, Tagging="team=data&tier=gold"
        )
        stamp_kv_s3(f"s3a://lake/{key}", {"k": "v"}, client=s3, part_size=ps)
        tags = {
            t["Key"]: t["Value"]
            for t in s3.get_object_tagging(Bucket="lake", Key=key)["TagSet"]
        }
        assert tags == {"team": "data", "tier": "gold"}, key
        _roundtrip_checks(s3, key, {"k": "v"}, blob)


def test_complete_multipart_is_conditional(s3):
    """r9 advisor item (lost-update window): the final
    CompleteMultipartUpload must carry IfMatch pinned to the ETag the
    tail was read from, so an object rewritten after the last
    UploadPartCopy fails the stamp instead of being clobbered with
    old-data+new-footer.  moto doesn't enforce the condition, so this
    pins the request shape."""
    big = _parquet_bytes(64, payload=12 * 1024 * 1024)
    s3.put_object(Bucket="lake", Key="c/p.parquet", Body=big)
    etag = s3.head_object(Bucket="lake", Key="c/p.parquet")["ETag"].strip('"')
    rec = _Recorder(s3)
    stamp_kv_s3(
        "s3a://lake/c/p.parquet",
        {"k": "v"},
        client=rec,
        part_size=5 * 1024 * 1024,
    )
    completes = rec.kwargs("complete_multipart_upload")
    assert len(completes) == 1
    assert completes[0]["IfMatch"] == etag
    _roundtrip_checks(s3, "c/p.parquet", {"k": "v"}, big)


def test_versioned_bucket_stamp_pins_generation_end_to_end():
    """r9 verdict #7: under bucket versioning, the tail GET, the tag
    fetch, and EVERY copy part must name the explicit VersionId that
    was headed — a concurrent PUT between the tail GET and the copy
    then cannot interleave (the copies read the pinned version, and
    the conditional complete rejects the swap).  The stamp writes a
    NEW version; the pre-stamp version stays byte-identical (the
    object-lock story: old versions are never deleted)."""
    with mock_aws():
        client = boto3.client("s3", region_name="us-east-1")
        client.create_bucket(Bucket="vlake")
        client.put_bucket_versioning(
            Bucket="vlake", VersioningConfiguration={"Status": "Enabled"}
        )
        blob = _parquet_bytes(64, payload=12 * 1024 * 1024)
        client.put_object(
            Bucket="vlake", Key="t/p.parquet", Body=blob, Tagging="a=b"
        )
        head = client.head_object(Bucket="vlake", Key="t/p.parquet")
        vid, etag = head["VersionId"], head["ETag"].strip('"')
        rec = _Recorder(client)
        n = stamp_kv_s3(
            "s3://vlake/t/p.parquet",
            {"round": "10"},
            client=rec,
            part_size=5 * 1024 * 1024,
        )
        assert n == 1
        copies = rec.kwargs("upload_part_copy")
        assert copies
        assert all(kw["CopySource"]["VersionId"] == vid for kw in copies)
        # one ETag spelling everywhere (r10 advisor): bare, matching
        # the IfMatch params below
        assert all(kw["CopySourceIfMatch"] == etag for kw in copies)
        gets = rec.kwargs("get_object")
        assert gets and all(kw["VersionId"] == vid for kw in gets)
        tag_gets = rec.kwargs("get_object_tagging")
        assert tag_gets and all(kw["VersionId"] == vid for kw in tag_gets)
        completes = rec.kwargs("complete_multipart_upload")
        assert len(completes) == 1 and completes[0]["IfMatch"] == etag
        # stamped head version is new; stamped bytes carry the kv; tags
        # carried; the pre-stamp version is untouched
        import io as _io

        got = client.get_object(Bucket="vlake", Key="t/p.parquet")
        assert got.get("VersionId") != vid
        data = got["Body"].read()
        md = pq.read_metadata(_io.BytesIO(data))
        meta = {k.decode(): v.decode() for k, v in (md.metadata or {}).items()}
        assert meta["round"] == "10"
        assert data[: len(blob)] == blob
        tags = {
            t["Key"]: t["Value"]
            for t in client.get_object_tagging(
                Bucket="vlake", Key="t/p.parquet"
            )["TagSet"]
        }
        assert tags == {"a": "b"}
        old = client.get_object(
            Bucket="vlake", Key="t/p.parquet", VersionId=vid
        )["Body"].read()
        assert old == blob


def test_tag_fetch_denied_degrades_to_tagless_stamp(s3):
    """Tag carry must not grow the stamp's minimal permission surface:
    a client without s3:GetObjectTagging gets a loud warning and a
    tag-less stamp, not a failure (r10 review finding)."""
    import warnings

    from botocore.exceptions import ClientError

    blob = _parquet_bytes(60)
    s3.put_object(Bucket="lake", Key="d/p.parquet", Body=blob)

    class _Denied(_Recorder):
        def __getattr__(self, name):
            if name == "get_object_tagging":
                def deny(*a, **kw):
                    raise ClientError(
                        {"Error": {"Code": "AccessDenied",
                                   "Message": "nope"}},
                        "GetObjectTagging",
                    )
                return deny
            return super().__getattr__(name)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        n = stamp_kv_s3(
            "s3a://lake/d/p.parquet", {"k": "v"}, client=_Denied(s3)
        )
    assert n == 1
    assert any("GetObjectTagging denied" in str(x.message) for x in w)
    _roundtrip_checks(s3, "d/p.parquet", {"k": "v"}, blob)


def test_concurrent_rewrite_fails_stamp_and_aborts_mpu(s3):
    """r10 verdict #6 — the ADVERSARIAL path of the conditional
    complete: a rewrite landing between the last uploaded part and
    CompleteMultipartUpload must surface PreconditionFailed and abort
    the MPU, leaving the rewritten object intact (never clobbered
    with old-data+new-footer).  moto accepts-and-ignores IfMatch, so
    this harness ENFORCES real S3 conditional-write semantics in a
    wrapper: complete compares the live ETag against the IfMatch
    param, and the 'concurrent' writer fires right after the footer
    part upload."""
    from botocore.exceptions import ClientError

    big = _parquet_bytes(64, payload=12 * 1024 * 1024)
    rewrite = _parquet_bytes(32, payload=6 * 1024 * 1024)
    s3.put_object(Bucket="lake", Key="adv/p.parquet", Body=big)

    class _Adversary(_Recorder):
        def __getattr__(self, name):
            inner = super().__getattr__(name)
            if name == "upload_part":
                def wrapped_part(*a, **kw):
                    r = inner(*a, **kw)
                    # the concurrent rewrite: lands AFTER every part
                    # of the stamp's MPU, BEFORE the complete
                    self._c.put_object(
                        Bucket="lake", Key="adv/p.parquet", Body=rewrite
                    )
                    return r
                return wrapped_part
            if name == "complete_multipart_upload":
                def wrapped_complete(*a, **kw):
                    live = self._c.head_object(
                        Bucket=kw["Bucket"], Key=kw["Key"]
                    )["ETag"].strip('"')
                    if kw.get("IfMatch", live).strip('"') != live:
                        raise ClientError(
                            {
                                "Error": {
                                    "Code": "PreconditionFailed",
                                    "Message": "At least one of the "
                                    "pre-conditions you specified did "
                                    "not hold",
                                }
                            },
                            "CompleteMultipartUpload",
                        )
                    return inner(*a, **kw)
                return wrapped_complete
            return inner

    adv = _Adversary(s3)
    with pytest.raises(ClientError) as exc:
        stamp_kv_s3(
            "s3a://lake/adv/p.parquet",
            {"k": "v"},
            client=adv,
            part_size=5 * 1024 * 1024,
        )
    assert exc.value.response["Error"]["Code"] == "PreconditionFailed"
    # the failed stamp must clean up its MPU (no orphaned uploads
    # accruing storage) ...
    assert adv.kwargs("abort_multipart_upload"), "MPU not aborted"
    ups = s3.list_multipart_uploads(Bucket="lake").get("Uploads", [])
    assert not ups, ups
    # ... and the concurrent writer's object is untouched
    got = s3.get_object(Bucket="lake", Key="adv/p.parquet")["Body"].read()
    assert got == rewrite
