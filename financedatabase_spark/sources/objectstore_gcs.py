"""GCS adapter for `ObjectStoreClient` — the second production shim.

`sources/objectstore.ConditionalPutLease` needs three conditional calls
(create-if-absent put, CAS put, CAS delete). On Google Cloud Storage
those are the public generation preconditions — the REST header
``x-goog-if-generation-match``, exposed by the ``google-cloud-storage``
SDK as the ``if_generation_match`` parameter: ``0`` means "only if the
object does NOT exist" (create-only), ``N`` means "only at generation
N" (CAS replace / delete). Unlike S3's opaque etags, GCS versions every
write with a monotonically increasing int64 GENERATION; this adapter
stringifies it into the `ObjectStoreClient` etag slot, so the lease
logic above is byte-identical across stores.

google-cloud-storage is NOT installed in this environment, so the
default-client path is exercised only where it exists (the contract
test skips without it); the TRANSLATION layer — parameter mapping,
generation normalization, 412 -> `PreconditionFailedError`, 404 ->
absent — is fully tested against an injected fake client with the SDK's
call/response shapes (tests/test_sinks_catalog.py), including the whole
lease conformance suite running over this adapter.

Error mapping is duck-typed on the ``google.api_core.exceptions``
surface (every GoogleAPICallError carries an integer ``code``) rather
than importing the SDK, so the adapter works identically under the real
client and the test fake:

- 412 (PreconditionFailed / FailedPrecondition) -> lost the CAS
- 404 (NotFound) -> absent (get returns None, delete is a no-op)
- 409 on a create-only write -> `PreconditionFailedError` (some GCS
  surfaces report generation-0 conflicts as 409 Conflict)

Reference parity: same as the S3 adapter (objectstore_s3.py) — the
reference's single-writer guarantee is an InnoDB transaction
(SQLHelpers.py:651-686); conditional writes are the lakehouse
equivalent, the primitive Iceberg's GCS commit path uses.
"""

from __future__ import annotations

from financedatabase_spark.sources.objectstore import PreconditionFailedError


def _code(exc: Exception) -> int | None:
    code = getattr(exc, "code", None)
    if callable(code):  # grpc-style exceptions expose code() — not ours
        return None
    return code if isinstance(code, int) else None


def _is_precondition_failure(exc: Exception) -> bool:
    return _code(exc) in (412, 409)


def _is_absent(exc: Exception) -> bool:
    return _code(exc) == 404


class GcsObjectStore:
    """`ObjectStoreClient` over a google-cloud-storage style client.

    ``client`` defaults to ``google.cloud.storage.Client()`` when the
    SDK is installed; tests inject a fake with the same call/response
    shapes (``client.bucket(name)`` -> ``bucket.blob(key)`` /
    ``bucket.get_blob(key)``, ``blob.upload_from_string(body,
    if_generation_match=N)``, ``blob.download_as_bytes()``,
    ``blob.delete(if_generation_match=N)``, ``blob.generation``).
    The stringified generation fills the etag slot of the
    `ObjectStoreClient` contract.
    """

    def __init__(self, bucket: str, client: object | None = None) -> None:
        if client is None:
            from google.cloud import storage  # absent in tests

            client = storage.Client()
        self.bucket = client.bucket(bucket)

    def put(
        self, key: str, body: bytes, *, if_none_match: bool = False,
        if_match: str | None = None,
    ) -> str:
        if if_none_match and if_match is not None:
            raise ValueError("if_none_match and if_match are mutually exclusive")
        blob = self.bucket.blob(key)
        kwargs: dict = {}
        if if_none_match:
            kwargs["if_generation_match"] = 0  # create-only
        if if_match is not None:
            kwargs["if_generation_match"] = int(if_match)  # CAS
        try:
            blob.upload_from_string(body, **kwargs)
        except Exception as exc:
            if _is_precondition_failure(exc):
                raise PreconditionFailedError(f"{key}: generation mismatch") from exc
            # CAS against an object deleted under us: the precondition
            # did not hold, whatever status the surface reports it as
            if if_match is not None and _is_absent(exc):
                raise PreconditionFailedError(f"{key}: absent") from exc
            raise
        return str(blob.generation)

    def get(self, key: str) -> tuple[bytes, str] | None:
        blob = self.bucket.get_blob(key)  # populates generation atomically
        if blob is None:
            return None
        try:
            # pin the read to the generation we resolved, so body and
            # "etag" can never come from different writes
            body = blob.download_as_bytes(if_generation_match=blob.generation)
        except Exception as exc:
            if _is_absent(exc) or _is_precondition_failure(exc):
                return self.get(key)  # replaced mid-read: re-resolve
            raise
        return body, str(blob.generation)

    def delete(self, key: str, *, if_match: str | None = None) -> None:
        blob = self.bucket.blob(key)
        kwargs: dict = {}
        if if_match is not None:
            kwargs["if_generation_match"] = int(if_match)
        try:
            blob.delete(**kwargs)
        except Exception as exc:
            if _is_absent(exc):
                return  # deleting an absent key is a no-op, per contract
            if _is_precondition_failure(exc):
                raise PreconditionFailedError(f"{key}: generation mismatch") from exc
            raise
