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


KNUTH_A = 2654435761  # Knuth multiplicative constant (2^32 * phi)
KNUTH_P = 1000000007


def knuth_hash(col):
    """Deterministic uniform hash of an integer id column in
    [0, KNUTH_P): ((id % P) * A) % P.  The inner ``% P`` keeps the
    product under 2^63 for ANY int64 id — congruent to (id*A) % P, so
    values are unchanged, but the expression cannot overflow under
    Spark's ANSI mode at 10^12-row scale.  SQL oracles mirror the same
    expression verbatim."""
    from pyspark.sql import functions as F

    return ((col % F.lit(KNUTH_P)) * F.lit(KNUTH_A)) % F.lit(KNUTH_P)
