"""I/O matrix for the convert tool (SURVEY §2.1 scans, §2.2 sinks).

Readers normalize every edge format to a typed DataFrame; writers apply
the reference's stringify-at-the-edge contract (missing -> '').
"""

from . import readers, writers  # noqa: F401
