"""NumPy simulation of lazy upper-bound selection — policy A/B for the
deep-vocab staleness cost (the 2.47 ms/round "other" bucket measured by
profile_breakdown at 8 MB / 1024 rounds).

Policies (ub maintenance after each merge):

  bounds  : ship policy — new-token row/col bounded by row b / col a capped
            at nhits; no extra verification
  eagerT  : bounds + each round ALSO verifies the top-T entries of the
            previous new token's row and column (modelling the extra pops
            folded into the first verify pass of the next selection)
  exact   : new-token row/col set to exact counts (in-kernel histogram)

Reports verify iterations per round — each extra iteration on device costs
~0.2 ms (one pop batch + one fused corpus pass).

Run: python scripts/sim_lazy_select2.py [MB] [merges] [policy] [T]
"""

import sys
import time

sys.path.insert(0, ".")
import numpy as np

from bench import load_corpus


def greedy_merge(toks, a, b, new):
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
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 1
    M = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    policy = sys.argv[3] if len(sys.argv) > 3 else "bounds"
    T = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    V = 256 + M
    BATCH = 8

    data = load_corpus(int(mb * (1 << 20)))
    toks = np.frombuffer(data, np.uint8).astype(np.int64)

    ub = np.zeros((V, V), np.int64)
    np.add.at(ub, (toks[:-1], toks[1:]), 1)

    total_iters = 0
    iters_hist = []
    prev_new = -1
    prev_ab = None
    t0 = time.perf_counter()
    for k in range(M):
        a_s = toks[:-1]
        b_s = toks[1:]
        pid_stream = a_s * V + b_s
        flat = ub.reshape(-1)
        it = 0
        while True:
            it += 1
            top = np.argpartition(flat, -BATCH)[-BATCH:]
            top = top[np.lexsort((top, flat[top]))][::-1]
            top = list(top)
            if policy in ("eagerT", "eagerX") and prev_new >= 0 and it == 1:
                # fold top-T of the hot row and column into the first pass
                row = ub[prev_new, :]
                rt = np.argpartition(row, -T)[-T:]
                col = ub[:, prev_new]
                ct = np.argpartition(col, -T)[-T:]
                top += [prev_new * V + int(c) for c in rt]
                top += [int(r) * V + prev_new for r in ct]
            if policy == "eagerX" and prev_ab is not None and it == 1:
                # ALSO the dropped bins: column a and row b of the merged
                # pair lost counts (pairs (v,a) became (v,X), (b,v) became
                # (X,v)) — their ub entries are stale-high too
                a0, b0 = prev_ab
                ca = np.argpartition(ub[:, a0], -T)[-T:]
                rb = np.argpartition(ub[b0, :], -T)[-T:]
                top += [int(r) * V + a0 for r in ca]
                top += [b0 * V + int(c) for c in rb]
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
            ub[new, :] = np.bincount(b2[a2 == new], minlength=V)
            ub[:, new] = np.bincount(a2[b2 == new], minlength=V)
        else:
            ub[new, :] = np.minimum(ub[tb, :], nhits)
            ub[:, new] = np.minimum(ub[:, ta], nhits)
            ub[new, new] = min(ub[tb, ta], nhits)
        prev_new = new
        prev_ab = (ta, tb)
        if (k + 1) % 128 == 0:
            h = np.asarray(iters_hist[-128:])
            print(f"k={k+1:5d}: iters/round mean={h.mean():.2f} max={h.max()} "
                  f"len={toks.size}", flush=True)
    dt = time.perf_counter() - t0
    print(f"policy={policy}(T={T}): total verify iters={total_iters} "
          f"({total_iters/M:.2f}/round), wall={dt:.1f}s", flush=True)


if __name__ == "__main__":
    main()
