"""Consumer-group membership + partition assignment with rebalance (T14).

Reference semantics: a cluster-registered consumer group splits the
physical partitions among live members; when a member joins or dies the
partitions are re-assigned, and each partition's CHECKPOINT survives the
move because it is persisted per-partition in shared storage, not inside
the member (reference: databus-client-http/.../DatabusV2ClusterRegistrationImpl.java:76
onGainedPartitionOwnership / onLostPartitionOwnership;
databus-cluster/.../DatabusCluster.java Helix-driven assignment;
ClusterCheckpointPersistenceProvider.java:48-66 ZK per-partition
checkpoints).

Spark restatement: the per-partition Spark streaming checkpointLocation
and snapshot store ARE the shared per-partition state — they are keyed
by partition id, never by member, so any member can resume any
partition exactly where the previous owner left it. This module only
decides WHO runs WHAT (the Helix analog); exactly-once handoff falls
out of Spark's checkpoint + the idempotent MERGE store.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class ConsumerCluster:
    """Deterministic range assignment over live members (sorted), the
    same contract Helix AUTO_REBALANCE gives the reference: every
    partition owned by exactly one live member, assignments stable under
    identical membership."""

    n_partitions: int
    members: list[str] = field(default_factory=list)
    generation: int = 0  # bumps on every membership change

    def join(self, member: str) -> None:
        if member not in self.members:
            self.members.append(member)
            self.members.sort()
            self.generation += 1

    def leave(self, member: str) -> None:
        if member in self.members:
            self.members.remove(member)
            self.generation += 1

    def assignment(self) -> dict[str, list[int]]:
        if not self.members:
            return {}
        out: dict[str, list[int]] = {m: [] for m in self.members}
        for pid in range(self.n_partitions):
            out[self.members[pid % len(self.members)]].append(pid)
        return out

    def owner_of(self, pid: int) -> str:
        if not self.members:
            raise RuntimeError("no live members")
        return self.members[pid % len(self.members)]
