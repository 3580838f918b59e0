"""Object-store credential plumbing — Hadoop filesystem configuration for
s3a:// gs:// wasbs:// abfss:// paths.

Reference parity: ``python-sdk/src/astro/files/locations/amazon/s3.py:13-100``
(S3Hook creds), ``google/gcs.py``, ``azure/wasb.py``. In Spark the
equivalent is setting the PUBLIC ``fs.*`` Hadoop keys on the active
session's Hadoop configuration; executors then pull file splits directly —
which is the reference's "native path", always.

Only documented upstream Hadoop/ABFS/GCS-connector keys are used here. The
actual cloud connectors (hadoop-aws, gcs-connector, hadoop-azure) must be
on the Spark classpath at deploy time; configuration is validated by unit
tests against the Hadoop conf, not against live buckets.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _hconf(spark: SparkSession):
    return spark.sparkContext._jsc.hadoopConfiguration()


def configure_s3(
    spark: SparkSession,
    access_key: str | None = None,
    secret_key: str | None = None,
    session_token: str | None = None,
    endpoint: str | None = None,
    region: str | None = None,
    anonymous: bool = False,
    path_style_access: bool | None = None,
) -> None:
    """Set hadoop-aws (s3a) credentials/endpoint on the session."""
    conf = _hconf(spark)
    if anonymous:
        conf.set(
            "fs.s3a.aws.credentials.provider",
            "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider",
        )
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
    if endpoint:
        conf.set("fs.s3a.endpoint", endpoint)
    if region:
        conf.set("fs.s3a.endpoint.region", region)
    if path_style_access is not None:
        conf.set("fs.s3a.path.style.access", str(path_style_access).lower())


def configure_gcs(
    spark: SparkSession,
    service_account_json_keyfile: str | None = None,
    project_id: str | None = None,
) -> None:
    """Set gcs-connector (gs) auth on the session."""
    conf = _hconf(spark)
    conf.set("fs.AbstractFileSystem.gs.impl", "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFS")
    conf.set("fs.gs.impl", "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem")
    if service_account_json_keyfile:
        conf.set("google.cloud.auth.service.account.enable", "true")
        conf.set("google.cloud.auth.service.account.json.keyfile", service_account_json_keyfile)
    if project_id:
        conf.set("fs.gs.project.id", project_id)


def configure_azure(
    spark: SparkSession,
    account: str,
    access_key: str | None = None,
    sas_token: str | None = None,
    container: str | None = None,
) -> None:
    """Set hadoop-azure (wasbs/abfss) auth on the session."""
    conf = _hconf(spark)
    if access_key:
        conf.set(f"fs.azure.account.key.{account}.blob.core.windows.net", access_key)
        conf.set(f"fs.azure.account.key.{account}.dfs.core.windows.net", access_key)
    if sas_token:
        if not container:
            raise ValueError("sas_token auth needs the container name")
        conf.set(
            f"fs.azure.sas.{container}.{account}.blob.core.windows.net", sas_token
        )


def get_hadoop_conf(spark: SparkSession, key: str) -> str | None:
    """Read back a Hadoop conf key (test/debug helper)."""
    return _hconf(spark).get(key)
