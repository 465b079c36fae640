"""Multi-chip parallelism: mesh sharding of the prover.

Replaces the reference's (absent) distribution layer (SURVEY.md section 2.20):
segments are data-parallel across one mesh axis ("seg"), trace rows are
sharded across another ("row") so NTT butterflies / Merkle layers ride XLA
collectives over ICI.
"""

from .sharding import (make_mesh, sharded_commit, sharded_prove_core,
                       trace_sharding)

__all__ = ["make_mesh", "sharded_commit", "sharded_prove_core",
           "trace_sharding"]
