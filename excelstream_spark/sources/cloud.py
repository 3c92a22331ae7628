"""Cloud filesystem configuration + object replication.

Reproduces the reference's cloud surface in Spark idiom:

- ``configure_s3`` — the S3A equivalent of the reference's builder options
  (explicit credentials, custom endpoint, path-style access for
  MinIO/R2/Spaces: /root/reference/src/cloud/s3_reader.rs:339-591).  Once
  configured, every source/sink in this repo (parquet/csv/xlsx) reads and
  writes ``s3a://`` URIs directly — streaming multipart upload with zero
  temp files is S3A's native behavior (`fs.s3a.fast.upload`), which is
  what the reference hand-built (PERFORMANCE_S3.md:35-49).
- ``configure_gcs`` — same for ``gs://`` via the GCS connector.
- ``replicate`` — cloud-to-cloud object copy (reference CloudReplicate,
  /root/reference/src/cloud/replicate.rs:224-449): server-side CopyObject
  when endpoints match, ranged-GET -> multipart-PUT streaming otherwise;
  returns transfer stats.  boto3 is import-gated (not in this container);
  the planning logic is testable without it.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import SparkSession

DEFAULT_CHUNK_BYTES = 5 * 1024 * 1024  # reference default chunk (replicate.rs:52)
DEFAULT_MAX_RETRIES = 3


def configure_s3(
    spark: SparkSession,
    access_key: str | None = None,
    secret_key: str | None = None,
    session_token: str | None = None,
    region: str | None = None,
    endpoint: str | None = None,
    path_style_access: bool = False,
    fast_upload: bool = True,
) -> None:
    """Set S3A configs on the active session (None = keep provider chain
    defaults, e.g. instance role)."""
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    if access_key:
        conf.set("fs.s3a.access.key", access_key)
    if secret_key:
        conf.set("fs.s3a.secret.key", secret_key)
    if session_token:
        conf.set("fs.s3a.session.token", session_token)
        conf.set(
            "fs.s3a.aws.credentials.provider",
            "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider",
        )
    if region:
        conf.set("fs.s3a.endpoint.region", region)
    if endpoint:
        conf.set("fs.s3a.endpoint", endpoint)
    conf.set("fs.s3a.path.style.access", "true" if path_style_access else "false")
    conf.set("fs.s3a.fast.upload", "true" if fast_upload else "false")
    conf.set("fs.s3a.multipart.size", str(DEFAULT_CHUNK_BYTES))


def configure_gcs(
    spark: SparkSession,
    project_id: str | None = None,
    service_account_json: str | None = None,
) -> None:
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    conf.set(
        "fs.gs.impl", "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem"
    )
    if project_id:
        conf.set("fs.gs.project.id", project_id)
    if service_account_json:
        conf.set("google.cloud.auth.service.account.json.keyfile", service_account_json)


# --- replication ----------------------------------------------------------

@dataclass
class ReplicateStats:
    """Transfer statistics (reference ReplicationStats, replicate.rs:76-98)."""

    bytes_transferred: int = 0
    chunks: int = 0
    seconds: float = 0.0
    server_side: bool = False

    @property
    def mb_per_sec(self) -> float:
        if self.seconds <= 0:
            return 0.0
        return self.bytes_transferred / 1024 / 1024 / self.seconds


@dataclass
class ReplicateConfig:
    chunk_bytes: int = DEFAULT_CHUNK_BYTES
    max_retries: int = DEFAULT_MAX_RETRIES


def plan_strategy(
    src_endpoint: str | None,
    dst_endpoint: str | None,
    src_region: str | None,
    dst_region: str | None,
) -> str:
    """'server_side' when both sides are the same service+region (native
    CopyObject, ~instant); 'streaming' otherwise (reference
    replicate.rs:293-301)."""
    if (src_endpoint or "") == (dst_endpoint or "") and (src_region or "") == (
        dst_region or ""
    ):
        return "server_side"
    return "streaming"


def replicate(
    src_bucket: str,
    src_key: str,
    dst_bucket: str,
    dst_key: str,
    src_client=None,
    dst_client=None,
    config: ReplicateConfig | None = None,
) -> ReplicateStats:
    """Copy one object cloud-to-cloud.  Driver-side utility (this is object
    management, not a DataFrame op — for fleets of objects, distribute the
    key list with ``spark.sparkContext.parallelize(keys).foreach``)."""
    try:
        import boto3
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "replicate() needs boto3 at runtime; planning logic is available "
            "via plan_strategy()"
        ) from e
    if src_client is None:
        src_client = boto3.client("s3")
    if dst_client is None:
        dst_client = src_client
    config = config or ReplicateConfig()
    stats = ReplicateStats()
    t0 = time.time()
    same = src_client is dst_client or (
        getattr(src_client.meta, "endpoint_url", None)
        == getattr(dst_client.meta, "endpoint_url", None)
        and src_client.meta.region_name == dst_client.meta.region_name
    )
    if same:
        dst_client.copy_object(
            Bucket=dst_bucket,
            Key=dst_key,
            CopySource={"Bucket": src_bucket, "Key": src_key},
        )
        head = dst_client.head_object(Bucket=dst_bucket, Key=dst_key)
        stats.bytes_transferred = head["ContentLength"]
        stats.server_side = True
    else:
        head = src_client.head_object(Bucket=src_bucket, Key=src_key)
        size = head["ContentLength"]
        mpu = dst_client.create_multipart_upload(Bucket=dst_bucket, Key=dst_key)
        parts = []
        try:
            offset, part_no = 0, 1
            while offset < size:
                end = min(offset + config.chunk_bytes, size) - 1
                for attempt in range(config.max_retries):
                    try:
                        chunk = src_client.get_object(
                            Bucket=src_bucket,
                            Key=src_key,
                            Range=f"bytes={offset}-{end}",
                        )["Body"].read()
                        break
                    except Exception:
                        if attempt == config.max_retries - 1:
                            raise
                part = dst_client.upload_part(
                    Bucket=dst_bucket,
                    Key=dst_key,
                    PartNumber=part_no,
                    UploadId=mpu["UploadId"],
                    Body=chunk,
                )
                parts.append({"ETag": part["ETag"], "PartNumber": part_no})
                stats.chunks += 1
                stats.bytes_transferred += len(chunk)
                offset, part_no = end + 1, part_no + 1
            dst_client.complete_multipart_upload(
                Bucket=dst_bucket,
                Key=dst_key,
                UploadId=mpu["UploadId"],
                MultipartUpload={"Parts": parts},
            )
        except Exception:
            dst_client.abort_multipart_upload(
                Bucket=dst_bucket, Key=dst_key, UploadId=mpu["UploadId"]
            )
            raise
    stats.seconds = time.time() - t0
    return stats
