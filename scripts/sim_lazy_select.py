"""NumPy simulation of the lazy upper-bound selection over a long merge
schedule: measures verify iterations per round (the 1K-merge degradation)
and A/Bs ub-maintenance policies:

  bounds : ship policy — new-token row/col bounded by row b / col a
           capped at nhits (no extra corpus pass)
  exact  : new-token row/col set to EXACT counts after each merge (what
           in-kernel MXU histogramming would provide)

Run: python scripts/sim_lazy_select.py [MB] [merges] [policy]
"""

import sys
import time

sys.path.insert(0, ".")
import numpy as np

from bench import load_corpus


def greedy_merge(toks, a, b, new):
    """Vectorized leftmost-greedy merge pass (reference semantics)."""
    t = toks
    nxt = np.empty_like(t)
    nxt[:-1] = t[1:]
    nxt[-1] = -1
    c = (t == a) & (nxt == b) & (nxt >= 0)
    if a == b:
        idx = np.arange(t.size)
        nz = np.where(c, -1, idx)
        np.maximum.accumulate(nz, out=nz)
        c &= ((idx - nz) % 2) == 1
    hits = np.flatnonzero(c)
    t = t.copy()
    t[hits] = new
    keep = np.ones(t.size, bool)
    keep[hits + 1] = False
    return t[keep], hits.size


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    M = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    policy = sys.argv[3] if len(sys.argv) > 3 else "bounds"
    V = 256 + M
    BATCH = 8

    data = load_corpus(mb << 20)
    toks = np.frombuffer(data, np.uint8).astype(np.int64)

    ub = np.zeros((V, V), np.int64)
    np.add.at(ub, (toks[:-1], toks[1:]), 1)

    total_iters = 0
    iters_hist = []
    t0 = time.perf_counter()
    for k in range(M):
        a_s = toks[:-1]
        b_s = toks[1:]
        pid_stream = a_s * V + b_s
        flat = ub.reshape(-1)
        it = 0
        while True:
            it += 1
            # top-BATCH by (count, pid)
            top = np.argpartition(flat, -BATCH)[-BATCH:]
            top = top[np.lexsort((top, flat[top]))][::-1]
            exact = np.array([(pid_stream == p).sum() for p in top])
            flat[top] = exact
            mx = flat.max()
            cands = np.flatnonzero(flat == mx)
            pid = cands[-1]
            if pid in top or mx == 0:
                break
        total_iters += it
        iters_hist.append(it)
        ta, tb = divmod(int(pid), V)
        new = 256 + k
        toks, nhits = greedy_merge(toks, ta, tb, new)
        ub[ta, tb] = 0
        if policy == "exact":
            a2 = toks[:-1]
            b2 = toks[1:]
            m_row = a2 == new
            m_col = b2 == new
            row = np.bincount(b2[m_row], minlength=V)
            col = np.bincount(a2[m_col], minlength=V)
            ub[new, :] = row
            ub[:, new] = col
        else:
            ub[new, :] = np.minimum(ub[tb, :], nhits)
            ub[:, new] = np.minimum(ub[:, ta], nhits)
            ub[new, new] = min(ub[tb, ta], nhits)
        if (k + 1) % 128 == 0:
            h = np.asarray(iters_hist[-128:])
            print(f"k={k+1:5d}: iters/round mean={h.mean():.2f} max={h.max()} "
                  f"len={toks.size}", flush=True)
    dt = time.perf_counter() - t0
    print(f"policy={policy}: total verify iters={total_iters} "
          f"({total_iters/M:.2f}/round), wall={dt:.1f}s")


if __name__ == "__main__":
    main()
