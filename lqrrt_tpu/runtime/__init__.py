"""Native host runtime: the controller-rate plan query path in C
(lock-free seqlock double buffer); see trajectory_server.py."""
from .trajectory_server import NativeUnavailable, TrajectoryServer  # noqa: F401
