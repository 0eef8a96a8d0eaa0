"""Hash contract — XXH3-64 hex composition helpers.

Mirrors the reference's two content hashes:
- ``domain_org_hash``: xxh3_64_hex(",".join(sorted_unique_normalized)
  + "|" + org) (/root/reference/internal/certlib/models.go:156-173);
- ``chain_hash``: xxh3_64_hex(base64-DER string) (models.go:127-130) —
  in our pipeline the "DER" analog is the framed payload bytes, so
  chain_hash = xxh3_64_hex(standard-base64(payload)).

Hex is ``%x`` — lowercase, no zero-padding.  Spark SQL's ``xxhash64``
is XXH64 over internal row encoding and is only used for partition
keys (SURVEY §2.8 F16), never for these values.
"""

from __future__ import annotations

import base64

from rxtls_spark.xxh3 import xxh3_64_hex


def domain_org_hash(sorted_normalized_domains: list[str], org: str) -> str:
    return xxh3_64_hex(",".join(sorted_normalized_domains) + "|" + (org or ""))


def chain_hash_from_payload(payload: bytes) -> str:
    as_der = base64.b64encode(payload or b"").decode("ascii")
    return xxh3_64_hex(as_der)
