"""Plan-shape audit helpers: detect single-task window stages.

A ``Window`` physical node with an EMPTY partition spec funnels its
whole input through one task — fine on a bounded band/census table,
fatal on row-scale data at 100 TB (Spark's runtime warning is ``No
Partition Defined for Window operation``). These helpers detect the
shape at PLAN time from formatted-explain text, so the repo-wide test
(``tests/test_plan_quality.py::
test_no_cartesian_row_python_or_unjustified_global_window``)
can force every occurrence to carry a written justification.

Blind spot, by design: a subtree materialized during query CONSTRUCTION
(``localCheckpoint`` — the iterative operators' lineage-truncation
discipline) is replaced by a scan of its result in the returned plan,
so windows inside it are invisible here. Those subtrees are bounded by
construction (1-row k picks, 64-row eigenvectors, band tables) and
their shapes are pinned at source (tests/test_banding.py,
tools/window_audit.py single-query runs before checkpointing landed).

Formatted-explain encoding (verified against Spark 4.1): a Window
node's ``Arguments:`` line carries three top-level bracket groups when
partitioned AND ordered (``[exprs], [partitionSpec], [orderSpec]``);
two groups are ambiguous — ``[exprs], [orderSpec]`` for an
unpartitioned ordered window vs ``[exprs], [partitionSpec]`` for a
partitioned unordered one — disambiguated by the sort-direction
markers (`` ASC``/`` DESC``) an order spec always carries; one group
(``[exprs]``) is an unpartitioned global frame.
"""

from __future__ import annotations

import contextlib
import io
import re

#: detail-section header of a WindowExec node, exactly — substring
#: matching would also catch WindowGroupLimit (the partitioned top-k
#: pushdown whose Arguments are [partitionSpec], [orderSpec], ...)
_WINDOW_HEADER = re.compile(r"^\(\d+\) Window$")


def top_level_groups(s: str) -> list[str]:
    """Split ``[a], [b, [c]], [d]`` into top-level bracket groups."""
    groups: list[str] = []
    depth, start = 0, None
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0 and start is not None:
                groups.append(s[start + 1 : i])
                start = None
    return groups


def unpartitioned_windows(plan: str) -> list[str]:
    """Order-spec snippets of every Window node with an empty partition
    spec in a formatted-explain string."""
    out: list[str] = []
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if not _WINDOW_HEADER.match(line.strip()):
            continue
        for j in range(i + 1, min(i + 6, len(lines))):
            if lines[j].startswith("Arguments: "):
                groups = top_level_groups(lines[j][len("Arguments: ") :])
                if len(groups) == 1:
                    out.append("(global frame, no order)")
                elif len(groups) == 2 and (
                    " ASC" in groups[1] or " DESC" in groups[1]
                ):
                    out.append(groups[1][:80])
                break
    return out


def formatted_plan(df) -> str:
    """``df.explain("formatted")`` captured as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()
