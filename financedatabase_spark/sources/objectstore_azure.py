"""Azure Blob Storage adapter for `ObjectStoreClient` — the third
production shim beside S3 (objectstore_s3.py) and GCS
(objectstore_gcs.py).

`sources/objectstore.ConditionalPutLease` needs three conditional calls
(create-if-absent put, CAS put, CAS delete). On Azure Blob Storage
those are the public HTTP conditional headers — ``If-None-Match: *``
(create-only, surfaced by the SDK as ``upload_blob(overwrite=False)``)
and ``If-Match: <etag>`` (CAS replace / delete, surfaced as the
``etag=`` + ``match_condition=IfNotModified`` pair). Azure etags are
quoted entity tags like S3's; this adapter strips the quotes into the
`ObjectStoreClient` etag slot so the lease logic above is
byte-identical across stores.

azure-storage-blob is NOT installed in this environment, so the
default-client path is exercised only where it exists (the contract
test skips without it); the TRANSLATION layer — call mapping, etag
normalization, 409/412 -> `PreconditionFailedError`, 404 -> absent —
is fully tested against an injected fake client with the SDK's
call/response shapes (tests/test_sinks_catalog.py), including the
whole lease conformance suite running over this adapter.

Error mapping is duck-typed on the ``azure.core.exceptions`` surface
(every HttpResponseError carries an integer ``status_code``) rather
than importing the SDK, so the adapter works identically under the
real client and the test fake:

- 412 (ResourceModifiedError / ConditionNotMet) -> lost the CAS
- 409 (ResourceExistsError / BlobAlreadyExists on a create-only
  write) -> `PreconditionFailedError`
- 404 (ResourceNotFoundError) -> absent (get returns None, delete is
  a no-op)

``match_condition`` is the real ``azure.core.MatchConditions``
enum when azure-core is importable, else the module-level
``IF_NOT_MODIFIED`` sentinel the test fake accepts — the adapter never
hard-imports the SDK.

Reference parity: same as the S3/GCS adapters — the reference's
single-writer guarantee is an InnoDB transaction
(SQLHelpers.py:651-686); conditional writes are the lakehouse
equivalent, the primitive every cloud commit protocol uses.
"""

from __future__ import annotations

from financedatabase_spark.sources.objectstore import PreconditionFailedError

#: sentinel used when azure.core is not importable (test fakes accept it)
IF_NOT_MODIFIED = "IfNotModified"


def _match_condition():
    try:
        from azure.core import MatchConditions  # absent in tests

        return MatchConditions.IfNotModified
    except ImportError:
        return IF_NOT_MODIFIED


def _status(exc: Exception) -> int | None:
    code = getattr(exc, "status_code", None)
    return code if isinstance(code, int) else None


def _is_precondition_failure(exc: Exception) -> bool:
    return _status(exc) in (409, 412)


def _is_absent(exc: Exception) -> bool:
    return _status(exc) == 404


def _unquote(etag: str) -> str:
    return etag.strip('"')


class AzureObjectStore:
    """`ObjectStoreClient` over an azure-storage-blob style client.

    ``client`` defaults to
    ``BlobServiceClient.from_connection_string(conn_str)`` when the SDK
    is installed; tests inject a fake with the same call/response
    shapes (``client.get_blob_client(container, blob)`` ->
    ``bc.upload_blob(body, overwrite=..., etag=..., match_condition=...)``
    returning ``{"etag": '"..."'}``, ``bc.download_blob()`` with
    ``.readall()`` + ``.properties.etag``, and
    ``bc.delete_blob(etag=..., match_condition=...)``)."""

    def __init__(
        self, container: str, client: object | None = None,
        conn_str: str | None = None,
    ) -> None:
        if client is None:
            from azure.storage.blob import BlobServiceClient  # absent in tests

            client = BlobServiceClient.from_connection_string(conn_str or "")
        self._client = client
        self.container = container

    def _bc(self, key: str):
        return self._client.get_blob_client(self.container, key)

    def put(
        self, key: str, body: bytes, *, if_none_match: bool = False,
        if_match: str | None = None,
    ) -> str:
        if if_none_match and if_match is not None:
            raise ValueError("if_none_match and if_match are mutually exclusive")
        bc = self._bc(key)
        try:
            if if_none_match:
                resp = bc.upload_blob(body, overwrite=False)
            elif if_match is not None:
                resp = bc.upload_blob(
                    body, overwrite=True, etag=f'"{if_match}"',
                    match_condition=_match_condition(),
                )
            else:
                resp = bc.upload_blob(body, overwrite=True)
        except Exception as exc:
            if _is_precondition_failure(exc):
                raise PreconditionFailedError(f"{key}: etag mismatch") from exc
            # CAS against a blob deleted under us: the precondition did
            # not hold, whatever status the surface reports it as
            if if_match is not None and _is_absent(exc):
                raise PreconditionFailedError(f"{key}: absent") from exc
            raise
        return _unquote(resp["etag"])

    def get(self, key: str) -> tuple[bytes, str] | None:
        bc = self._bc(key)
        try:
            stream = bc.download_blob()
        except Exception as exc:
            if _is_absent(exc):
                return None
            raise
        # readall + the etag captured in the same response: body and
        # etag cannot come from different writes
        return stream.readall(), _unquote(stream.properties.etag)

    def delete(self, key: str, *, if_match: str | None = None) -> None:
        bc = self._bc(key)
        kwargs: dict = {}
        if if_match is not None:
            kwargs["etag"] = f'"{if_match}"'
            kwargs["match_condition"] = _match_condition()
        try:
            bc.delete_blob(**kwargs)
        except Exception as exc:
            if _is_absent(exc):
                return  # deleting an absent key is a no-op, per contract
            if _is_precondition_failure(exc):
                raise PreconditionFailedError(f"{key}: etag mismatch") from exc
            raise
