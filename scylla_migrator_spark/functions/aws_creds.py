"""AWS credential-chain resolution — AwsUtils.computeFinalCredentials parity
(AwsUtils.scala:37-76): the configured static key pair either IS the final
credential, or it only authenticates an STS AssumeRole call whose temporary
session credentials (access key + secret + session token) sign the actual
requests. The STS client is injected so the chain logic is testable against
a fake without network access; a live deployment passes a real client with
the same ``assume_role(arn, session_name, base)`` surface."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Protocol

from scylla_migrator_spark.config import AWSCredentials


@dataclass(frozen=True)
class ResolvedCredentials:
    """The final signing credentials; ``session_token`` present iff they
    came from an assume-role hop. Redacted repr — resolved secrets must
    never reach logs (same posture as the config classes)."""

    access_key: str
    secret_key: str
    session_token: str | None = None

    def __repr__(self) -> str:  # never leak resolved secrets
        via = "assume-role" if self.session_token else "static"
        return f"ResolvedCredentials(<redacted>, via={via})"


class StsClient(Protocol):
    def assume_role(
        self, role_arn: str, session_name: str, base: ResolvedCredentials
    ) -> dict[str, Any]: ...


def compute_final_credentials(
    configured: AWSCredentials | None, sts_client: StsClient | None = None
) -> ResolvedCredentials | None:
    """Resolve the configured chain to final signing credentials
    (AwsUtils.computeFinalCredentials): None passes through (the runtime's
    default provider chain applies), a bare key pair is final, an
    assume-role hop exchanges the base pair for session credentials."""
    if configured is None:
        return None
    base = ResolvedCredentials(configured.access_key, configured.secret_key)
    if configured.assume_role is None:
        return base
    if sts_client is None:
        raise ValueError(
            "assumeRole is configured but no STS client is available to "
            "perform the delegation"
        )
    resp = sts_client.assume_role(
        configured.assume_role.arn,
        configured.assume_role.get_session_name(),
        base,
    )
    return ResolvedCredentials(
        resp["AccessKeyId"], resp["SecretAccessKey"], resp["SessionToken"]
    )
