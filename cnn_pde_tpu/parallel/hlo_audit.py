"""Communication-shape auditing: count collective ops in compiled HLO.

The values-equal tests certify that every sharded kernel is *correct*; these
helpers certify the communication *shape* — that a kernel compiles to exactly
the collectives its design promises (e.g. the halo-exchange FTCS step lowers
to ONE ppermute pair per neighbor exchange, not a full-tensor all-gather;
the substructured tridiagonal solve gathers only O(S·rows) interface scalars
whose size is independent of the sharded extent H).  Compiled collective
counts are the strongest multi-chip statement available without hardware:
the same HLO runs with the same collective schedule on real ICI, only the
transport changes (VERDICT r3 item 4; SURVEY.md §2.6).

Used by ``tests/test_parallel.py::test_hlo_*`` and the driver dryrun
(``__graft_entry__._dryrun_sharded_kernels`` prints the audited counts).
"""

from __future__ import annotations

import re

import jax

__all__ = ["COLLECTIVES", "collective_counts", "gather_result_shapes",
           "compile_text"]

COLLECTIVES = ("all-reduce", "all-gather", "all-to-all",
               "collective-permute", "reduce-scatter")

# an HLO instruction body: `%name = f32[dims]{layout} op-name(operands)`;
# async collectives appear as `op-name-start` (the matching `-done` takes the
# start handle, not tensor operands, so only `-start` is counted).
_INSTR = r" {op}(?:-start)?\("


def compile_text(fn, *args) -> str:
    """Compiled HLO text of ``jit(fn)`` at ``args`` (post-SPMD-partitioning,
    post-fusion — the collectives counted are the ones that execute)."""
    return jax.jit(fn).lower(*args).compile().as_text()


def collective_counts(txt: str) -> dict:
    """{collective op name: number of compiled instructions} for ``txt``
    (a compiled-HLO string, or pass a callable + args via compile_text)."""
    return {op: len(re.findall(_INSTR.format(op=re.escape(op)), txt))
            for op in COLLECTIVES}


def gather_result_shapes(txt: str):
    """[(element_type, (dims...)), ...] for every all-gather in ``txt`` —
    lets tests assert WHAT is gathered (e.g. integer index tensors only, or
    interface scalars whose size is independent of the sharded extent)."""
    out = []
    for m in re.finditer(
            r"= (\w+)\[([\d,]*)\][^=]*? all-gather(?:-start)?\(", txt):
        dims = tuple(int(d) for d in m.group(2).split(",") if d)
        out.append((m.group(1), dims))
    return out
