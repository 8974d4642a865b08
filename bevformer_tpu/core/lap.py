"""Linear assignment on-device (pure jnp, exact).

The reference solves Hungarian matching with scipy on the host
(`hungarian_assigner_3d.py:118-127`). On TPU runtimes that do not support
host callbacks inside jit (e.g. the axon PJRT used here), we solve the
assignment on device with the O(n^3) Hungarian algorithm with potentials
(Jonker-Volgenant-style shortest augmenting paths). All inner updates are
vectorized over the query axis; the sequential structure is bounded
while/fori loops, so a whole batch of problems runs lockstep under vmap.

Exact: produces an optimal assignment (same total cost as scipy;
verified in tests/test_lap.py).

Problem: cost [Q, G] with Q queries (rows) >= G gts (columns); match every
valid gt (column < num_gt) to a distinct query minimizing total cost.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

INF = jnp.float32(1e30)


@jax.jit
def hungarian_assign(cost: jnp.ndarray, num_gt: jnp.ndarray) -> jnp.ndarray:
    """cost [Q, G], num_gt scalar -> assigned query per gt [G] (-1 padded).

    Internally works on the transposed [G, Q] problem: for each gt (row)
    find an augmenting path over queries (columns) using dual potentials.
    """
    q, g = cost.shape
    c = cost.T.astype(jnp.float32)  # [G, Q]

    u = jnp.zeros((g,), jnp.float32)  # row potentials
    v = jnp.zeros((q,), jnp.float32)  # column potentials
    match_col = jnp.full((q,), -1, jnp.int32)  # column -> row

    def assign_row(i, carry):
        u, v, match_col = carry

        def do(carry):
            u, v, match_col = carry
            minv = jnp.full((q,), INF)
            way = jnp.full((q,), -1, jnp.int32)  # parent column of column j
            used = jnp.zeros((q,), bool)

            # state: (cur_row, prev_col, minv, way, used, u, v, done, j_final)
            def cond(s):
                return ~s[7]

            def body(s):
                cur_row, prev_col, minv, way, used, u, v, done, jf = s
                red = c[cur_row] - u[cur_row] - v  # [Q]
                better = (~used) & (red < minv)
                minv = jnp.where(better, red, minv)
                way = jnp.where(better, prev_col, way)

                masked = jnp.where(used, INF, minv)
                j1 = jnp.argmin(masked).astype(jnp.int32)
                delta = masked[j1]

                # update potentials
                used_rows_mask = used  # columns in the tree
                # u[rows matched to used cols] += delta; v[used cols] -= delta
                rows_in_tree = jnp.where(used, match_col, -1)
                row_add = (
                    jnp.zeros((g,), jnp.float32)
                    .at[jnp.where(rows_in_tree >= 0, rows_in_tree, 0)]
                    .add(jnp.where(rows_in_tree >= 0, delta, 0.0))
                )
                u = u + row_add
                u = u.at[i].add(delta)
                v = jnp.where(used, v - delta, v)
                minv = jnp.where(used, minv, minv - delta)

                used = used.at[j1].set(True)
                nxt_row = match_col[j1]
                done = nxt_row < 0
                return (
                    jnp.where(done, cur_row, nxt_row),
                    j1,
                    minv,
                    way,
                    used,
                    u,
                    v,
                    done,
                    jnp.where(done, j1, jf),
                )

            init = (
                jnp.int32(i),
                jnp.int32(-1),
                minv,
                way,
                used,
                u,
                v,
                jnp.bool_(False),
                jnp.int32(-1),
            )
            s = jax.lax.while_loop(cond, body, init)
            _, _, _, way, _, u, v, _, j1 = s

            # augment: walk parents flipping matches
            def aug_cond(t):
                j, _ = t
                return j >= 0

            def aug_body(t):
                j, mc = t
                pj = way[j]
                # row that owned pj (or the new row i if pj == -1 start)
                row = jnp.where(pj >= 0, mc[pj], i)
                mc = mc.at[j].set(row)
                return pj, mc

            _, match_col2 = jax.lax.while_loop(aug_cond, aug_body, (j1, match_col))
            return u, v, match_col2

        return jax.lax.cond(i < num_gt, do, lambda x: x, (u, v, match_col))

    u, v, match_col = jax.lax.fori_loop(0, g, assign_row, (u, v, match_col))

    # column->row map to row->column map
    idx = jnp.where(match_col >= 0, match_col, g)
    assigned = jnp.full((g + 1,), -1, jnp.int32)
    assigned = assigned.at[idx].set(jnp.arange(q, dtype=jnp.int32), mode="drop")
    assigned = assigned[:g]
    return jnp.where(jnp.arange(g) < num_gt, assigned, -1)


def assignment_to_per_query(assigned_q: jnp.ndarray, num_queries: int) -> jnp.ndarray:
    """[G] gt->query map to [Q] query->gt map (-1 background)."""
    g = assigned_q.shape[0]
    idx = jnp.where(assigned_q >= 0, assigned_q, num_queries)
    out = jnp.full((num_queries + 1,), -1, jnp.int32)
    out = out.at[idx].set(jnp.arange(g, dtype=jnp.int32))
    return out[:num_queries]


# Backwards-compatible name used by the assigner
auction_assign = hungarian_assign
