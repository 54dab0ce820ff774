#!/usr/bin/env python3
"""Golden-value generator for the fastdtw parity spec.

Independent transcription of the published FastDTW algorithm (Salvador &
Chan, "FastDTW: Toward Accurate Dynamic Time Warping in Linear Time and
Space", Intelligent Data Analysis 11(5), 2007), matching the semantics of
the pypi `fastdtw` package the reference calls with radius=1
(srai/benchmark/_custom_metrics.py:71-88): pairwise-average coarsening,
radius-cell window expansion around the coarse path, constrained DP with
first-wins tie-breaking in (up, left, diagonal) order. Point distance is
geopy-style great_circle (atan2 form, R = 6371.009 km), the reference's
`dist` lambda.

Run: python3 tools/gen_fastdtw_golden.py  → paste output into
src/test/scala/graft/FastDtwSpec.scala. The Scala implementation in
GeoMetrics performs the same FP operations in the same order, so values are
expected to match bit-for-bit.
"""
import math

R = 6371009.0


def great_circle_m(p, q):
    lat1, lng1 = math.radians(p[0]), math.radians(p[1])
    lat2, lng2 = math.radians(q[0]), math.radians(q[1])
    dl = lng2 - lng1
    s1, c1 = math.sin(lat1), math.cos(lat1)
    s2, c2 = math.sin(lat2), math.cos(lat2)
    sd, cd = math.sin(dl), math.cos(dl)
    a = c2 * sd
    b = c1 * s2 - s1 * c2 * cd
    y = math.sqrt(a * a + b * b)
    x = s1 * s2 + c1 * c2 * cd
    return R * math.atan2(y, x)


def reduce_by_half(x):
    m = len(x) - len(x) % 2
    return [((x[i][0] + x[i + 1][0]) / 2, (x[i][1] + x[i + 1][1]) / 2)
            for i in range(0, m, 2)]


def constrained_dtw(x, y, window):
    len_x, len_y = len(x), len(y)
    if window is None:
        window = [(i, j) for i in range(len_x) for j in range(len_y)]
    D = {}
    INF = float('inf')
    D[0, 0] = (0.0, 0, 0)
    for i0, j0 in window:
        i, j = i0 + 1, j0 + 1
        dt = great_circle_m(x[i - 1], y[j - 1])
        best = None
        for (pi, pj) in ((i - 1, j), (i, j - 1), (i - 1, j - 1)):
            pd = D.get((pi, pj), (INF,))[0]
            cand = (pd + dt, pi, pj)
            if best is None or cand[0] < best[0]:  # first-wins on ties
                best = cand
        D[i, j] = best
    path = []
    i, j = len_x, len_y
    while not (i == 0 and j == 0):
        path.append((i - 1, j - 1))
        _, i, j = D[i, j]
    path.reverse()
    return D[len_x, len_y][0], path


def expand_window(path, len_x, len_y, radius):
    path_ = set(path)
    for i, j in path:
        for a in range(-radius, radius + 1):
            for b in range(-radius, radius + 1):
                path_.add((i + a, j + b))
    window_ = set()
    for i, j in path_:
        for cell in ((i * 2, j * 2), (i * 2, j * 2 + 1),
                     (i * 2 + 1, j * 2), (i * 2 + 1, j * 2 + 1)):
            window_.add(cell)
    window = []
    start_j = 0
    for i in range(0, len_x):
        new_start_j = None
        for j in range(start_j, len_y):
            if (i, j) in window_:
                window.append((i, j))
                if new_start_j is None:
                    new_start_j = j
            elif new_start_j is not None:
                start_j = new_start_j
                break
    return window


def fastdtw(x, y, radius=1):
    min_size = radius + 2
    if len(x) < min_size or len(y) < min_size:
        return constrained_dtw(x, y, None)
    xs, ys = reduce_by_half(x), reduce_by_half(y)
    _, path = fastdtw(xs, ys, radius)
    return constrained_dtw(x, y, expand_window(path, len(x), len(y), radius))


def exact_dtw(x, y):
    return constrained_dtw(x, y, None)[0]


def main():
    # fixed lat/lng paths; C is adversarial: a detour spike that the coarse
    # path smooths away, so the radius-1 window misses the optimal warp
    A = [(52.0 + 0.01 * i, 21.0 + 0.005 * i) for i in range(8)]
    B = [(52.0 + 0.01 * i, 21.0 + 0.005 * i + 0.002) for i in range(8)]
    C = [(52.00, 21.000), (52.08, 21.500), (52.01, 21.001), (52.02, 21.002),
         (52.03, 21.003), (52.90, 21.900), (52.05, 21.005), (52.06, 21.006),
         (52.07, 21.007), (52.08, 21.008), (52.09, 21.009), (52.10, 21.010),
         (52.11, 21.011), (52.12, 21.012), (52.13, 21.013), (52.14, 21.014)]
    D_ = [(52.0 + 0.01 * i, 21.0) for i in range(16)]
    S = [(52.0, 21.0), (52.1, 21.1)]  # short: fastdtw == exact by definition
    # adversarial pair where the radius-1 window provably misses the optimal
    # warp (fastdtw > exact) — found by seeded search, frozen here
    E = [(52.30103264110699, 21.67813697913109), (52.20257441340681, 21.16960715319046),
         (52.90572159992549, 21.659990004675848), (52.44193248076969, 21.891726920317737),
         (52.32696061882941, 21.665899062533672), (52.19850577886532, 21.4308952823558),
         (52.8059883993464, 21.914221198859003), (52.88026891808353, 21.384418682899902)]
    F = [(52.58310718775394, 21.31648684449414), (52.1361763263833, 21.496467041602322),
         (52.83709561747054, 21.84872030497024), (52.71121776151761, 21.950000151845515),
         (52.27679599688841, 21.169128910547713), (52.45064945125097, 21.275162822944907),
         (52.21408037715328, 21.413984800745162), (52.62573355823737, 21.493875366986895),
         (52.31537164536324, 21.839118412449228), (52.98203650582415, 21.452477338316637),
         (52.074679216956554, 21.031485775695174), (52.8728290543523, 21.041488399194588),
         (52.7086309290012, 21.570581960336973), (52.30903035140996, 21.791513521701386),
         (52.019114014811706, 21.135881158748187), (52.4548324137175, 21.024726508328417),
         (52.829668434459066, 21.237409008884836), (52.140874525881166, 21.046942569196318),
         (52.629180305565185, 21.446480766751023)]
    cases = [("A_B", A, B), ("C_D", C, D_), ("S_A", S, A), ("A_A", A, A),
             ("E_F", E, F)]
    for name, x, y in cases:
        fd = fastdtw(x, y)[0]
        ex = exact_dtw(x, y)
        print(f"{name}: fastdtw={fd!r} exact={ex!r} differ={fd != ex}")


if __name__ == "__main__":
    main()
