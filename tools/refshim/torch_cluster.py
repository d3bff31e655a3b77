"""torch_cluster.random_walk stand-in.

Semantics (torch_cluster CPU kernel): uniform neighbor walks over the CSR
built from (row, col); a node with no outgoing edges stays in place. Returns
``(batch, walk_length + 1)`` including the start column. Draws from the torch
global RNG. The reference guarantees sorted row input (its edges come from a
coalesced ``to_undirected``); we sort defensively anyway (same multiset of
neighbors per node → identical distribution).
"""

import torch


def random_walk(row, col, batch, walk_length, coalesced=True, num_nodes=None, p=1, q=1):
    n = int(num_nodes) if num_nodes is not None else int(max(row.max(), col.max())) + 1
    order = torch.argsort(row)
    row, col = row[order], col[order]
    deg = torch.zeros(n, dtype=torch.long).index_add_(0, row, torch.ones_like(row))
    rowptr = torch.zeros(n + 1, dtype=torch.long)
    torch.cumsum(deg, 0, out=rowptr[1:])

    cur = batch.clone().to(torch.long)
    out = [cur]
    for _ in range(int(walk_length)):
        d = deg[cur]
        pick = (torch.rand(cur.numel()) * d.clamp(min=1).to(torch.float)).floor().to(torch.long)
        # clamp the flat index: torch.where evaluates both branches, and a
        # degree-0 node at the CSR tail would otherwise index past col
        idx = (rowptr[cur] + torch.minimum(pick, (d - 1).clamp(min=0))).clamp(max=max(col.numel() - 1, 0))
        nxt = torch.where(d > 0, col[idx], cur)
        out.append(nxt)
        cur = nxt
    return torch.stack(out, dim=1)
