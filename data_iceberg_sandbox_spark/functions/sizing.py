"""On-disk size probe shared by every data-scaled broadcast gate
(r13 review: the file/dir/else-inf shape was hand-rolled in three
places and the laketable copy failed OPEN — os.walk on a missing or
unreadable directory silently yields nothing, sum() returned 0, and
the hint was force-applied to a dim of unknown size)."""

from __future__ import annotations

import os

# 512 MB on disk ≈ SF~200 customer ≈ comfortably under the broadcast
# ceiling after projection; shared bound for every data-scaled hint.
BROADCAST_DIM_CAP_BYTES = 512 << 20


def path_bytes(path: str) -> float:
    """Bytes under ``path`` (file or directory). Fails CLOSED: a path
    that cannot be statted or walked reports +inf so size gates decline
    the broadcast in exactly the unknown-size case they exist to guard
    (an EXISTING empty directory is genuinely 0 bytes and reports 0)."""

    def _raise(err: OSError) -> None:
        raise err

    try:
        if os.path.isfile(path):
            return os.path.getsize(path)
        if os.path.isdir(path):
            return sum(
                os.path.getsize(os.path.join(dp, fn))
                # onerror re-raises: the default silently SKIPS
                # unreadable subtrees, undercounting toward fail-open
                for dp, _dns, fns in os.walk(path, onerror=_raise)
                for fn in fns
            )
    except OSError:
        return float("inf")
    return float("inf")
