"""S3 adapter for `ObjectStoreClient` — the production shim, shipped.

`sources/objectstore.ConditionalPutLease` needs three conditional calls
(create-if-absent put, CAS put, CAS delete). On S3 those are public
``PutObject`` / ``DeleteObject`` preconditions — ``If-None-Match: *``
(create-only; 412 on conflict) and ``If-Match: <etag>`` (proceed only
at that etag), generally available on general-purpose buckets since
2024 and exposed by boto3 as the ``IfNoneMatch`` / ``IfMatch``
parameters. GCS and Azure adapters are the same shape with
``x-goog-if-generation-match`` / HTTP ``If-Match`` respectively.

boto3 is NOT installed in this environment, so the default-client path
is exercised only where it exists (the contract test skips without it);
the TRANSLATION layer — parameter mapping, etag normalization, 412/409
-> `PreconditionFailedError`, 404 -> absent — is fully tested against
an injected fake client with S3's response shapes
(tests/test_sinks_catalog.py), including the whole lease conformance
suite running over this adapter.

Error mapping is duck-typed on the botocore ``ClientError`` surface
(``exc.response["ResponseMetadata"]["HTTPStatusCode"]`` and
``exc.response["Error"]["Code"]``) rather than importing botocore, so
the adapter works identically under the real SDK and the test fake:

- 412 ``PreconditionFailed`` -> `PreconditionFailedError` (lost the CAS)
- 409 ``ConditionalRequestConflict`` -> `PreconditionFailedError`
  (a concurrent conditional write was in flight; the caller's
  acquire/renew retry loop handles it like any lost race)
- 404 / ``NoSuchKey`` -> absent (get returns None, delete is a no-op)

Reference parity: the reference's single-writer guarantee is an InnoDB
transaction (SQLHelpers.py:651-686); this is the lakehouse equivalent,
the same conditional-write primitive Delta's S3 LogStore and Iceberg
commit protocols rely on.
"""

from __future__ import annotations

from financedatabase_spark.sources.objectstore import PreconditionFailedError


def _http_status(exc: Exception) -> int | None:
    resp = getattr(exc, "response", None)
    if isinstance(resp, dict):
        return resp.get("ResponseMetadata", {}).get("HTTPStatusCode")
    return None


def _error_code(exc: Exception) -> str:
    resp = getattr(exc, "response", None)
    if isinstance(resp, dict):
        return str(resp.get("Error", {}).get("Code", ""))
    return ""


def _is_precondition_failure(exc: Exception) -> bool:
    return _http_status(exc) in (412, 409) or _error_code(exc) in (
        "PreconditionFailed",
        "ConditionalRequestConflict",
    )


def _is_absent(exc: Exception) -> bool:
    return _http_status(exc) == 404 or _error_code(exc) in ("NoSuchKey", "404")


class S3ObjectStore:
    """`ObjectStoreClient` over an S3 (boto3-style) client.

    ``client`` defaults to ``boto3.client("s3")`` when boto3 is
    installed; tests inject a fake with the same call/response shapes.
    Keys are stored under ``bucket`` verbatim (the lease passes fully
    qualified ``<table_key>/_LOCK.json`` keys).
    """

    def __init__(self, bucket: str, client: object | None = None) -> None:
        if client is None:
            import boto3  # the production dependency; absent in tests

            client = boto3.client("s3")
        self.bucket = bucket
        self.client = client

    @staticmethod
    def _etag(resp: dict) -> str:
        return str(resp["ETag"]).strip('"')

    def put(
        self, key: str, body: bytes, *, if_none_match: bool = False,
        if_match: str | None = None,
    ) -> str:
        if if_none_match and if_match is not None:
            raise ValueError("if_none_match and if_match are mutually exclusive")
        kwargs: dict = {"Bucket": self.bucket, "Key": key, "Body": body}
        if if_none_match:
            kwargs["IfNoneMatch"] = "*"
        if if_match is not None:
            kwargs["IfMatch"] = if_match
        try:
            return self._etag(self.client.put_object(**kwargs))
        except Exception as exc:
            if _is_precondition_failure(exc):
                raise PreconditionFailedError(f"{key}: {_error_code(exc)}") from exc
            # If-Match on an ABSENT key is S3's 404, but the client
            # contract says 'precondition did not hold'
            if if_match is not None and _is_absent(exc):
                raise PreconditionFailedError(f"{key}: absent") from exc
            raise

    def get(self, key: str) -> tuple[bytes, str] | None:
        try:
            resp = self.client.get_object(Bucket=self.bucket, Key=key)
        except Exception as exc:
            if _is_absent(exc):
                return None
            raise
        body = resp["Body"].read()
        return body, self._etag(resp)

    def delete(self, key: str, *, if_match: str | None = None) -> None:
        kwargs: dict = {"Bucket": self.bucket, "Key": key}
        if if_match is not None:
            kwargs["IfMatch"] = if_match
        try:
            self.client.delete_object(**kwargs)
        except Exception as exc:
            if _is_absent(exc):
                return  # deleting an absent key is a no-op, per contract
            if _is_precondition_failure(exc):
                raise PreconditionFailedError(f"{key}: {_error_code(exc)}") from exc
            raise
