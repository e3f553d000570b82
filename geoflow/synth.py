"""Deterministic synthetic input tables (seed-fixed, no external data).

Generates the Common-Crawl-style ``pages`` table of BASELINE.json:input_hint
(`url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string`),
the small-side ``polygons`` join table (FIXTURES.md §F4) and the
``knn_queries`` table (§F5).  Everything is a pure function of (seed, n) so
goldens and oracles are reproducible; page text embeds geotags in the exact
grammar ``extract.py`` parses.

Skew by construction (north rule): ~20% of all geotags land inside one
0.5°x0.5° hot box around (120.5, 31.25) and urls cluster on few hosts —
the hot-cell salting path (shuffle.py) is exercised by real skew.
"""

from __future__ import annotations

import pathlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
N_HOSTS = 1000  # url host clustering (few hosts -> dense cells, skew)
EPOCH_US = 1_600_000_000_000_000  # fixed base timestamp (us)
LANGS = ("en", "zh", "de", "fr")
HOT_LNG, HOT_LAT, HOT_HALF = 120.5, 31.25, 0.25
REGION = (100.0, 20.0, 140.0, 50.0)  # minx, miny, maxx, maxy


def _geotag_coords(rng: np.random.Generator, n: int
                   ) -> tuple[np.ndarray, np.ndarray]:
    """n geotag coordinates: 20% hot cluster, 70% region grid, 10% world."""
    kind = rng.random(n)
    lng = np.empty(n)
    lat = np.empty(n)
    hot = kind < 0.2
    lng[hot] = HOT_LNG + rng.uniform(-HOT_HALF, HOT_HALF, int(hot.sum()))
    lat[hot] = HOT_LAT + rng.uniform(-HOT_HALF, HOT_HALF, int(hot.sum()))
    reg = (kind >= 0.2) & (kind < 0.9)
    nr = int(reg.sum())
    lng[reg] = rng.uniform(REGION[0], REGION[2], nr)
    lat[reg] = rng.uniform(REGION[1], REGION[3], nr)
    wld = kind >= 0.9
    nw = int(wld.sum())
    lng[wld] = rng.uniform(-180, 180, nw)
    lat[wld] = rng.uniform(-85, 85, nw)
    lng = np.round(lng, 4)
    lat = np.round(lat, 4)
    # exact duplicates for dedup testing: every 17th tag repeats tag 0
    if n > 17:
        dup = np.arange(17, n, 17)
        lng[dup] = lng[0]
        lat[dup] = lat[0]
    return lng, lat


_FILLER_POOL_SENTENCES = [
    "The quick brown fox jumps over the lazy dog near the old river "
    "bridge while tourists take photographs of the ancient stone wall. ",
    "Local news reports describe steady growth in regional commerce as "
    "markets reopen and shipping lanes return to normal schedules. ",
    "A detailed weather analysis predicts scattered showers across the "
    "coastal plains with gradual clearing expected by late afternoon. ",
    "Archived records from the municipal library document the town's "
    "founding, its early trade routes and the harbor expansion of 1890. ",
    "Die Landesregierung und der Stadtrat haben nicht nur neue Radwege "
    "geplant, sondern auch die Sanierung der alten Markthalle beschlossen. ",
    "Le conseil municipal et le comité des fêtes ne se réunissent pas "
    "le même jour, et le marché couvert reste ouvert toute la semaine. ",
    "El ayuntamiento anunció que los trabajos de restauración de la "
    "plaza mayor continuarán durante los próximos meses del año. ",
    "Community volunteers organized a cleanup of the waterfront park "
    "and planted native shrubs along the footpath to the lighthouse. ",
]


def _filler_pool(fill_kb: int) -> list[str]:
    """8 deterministic ~fill_kb-KB paragraphs (Common-Crawl-ish text
    mass; contains no geotag grammar)."""
    out = []
    for i in range(8):
        s = _FILLER_POOL_SENTENCES[i]
        reps = max(1, (fill_kb * 1024) // len(s.encode()))
        out.append(s * reps)
    return out


def make_pages(n_rows: int, seed: int = SEED, fill_kb: int = 0) -> pa.Table:
    """Build the pages table (vectorized; ~1M rows in a few seconds).

    ``fill_kb`` > 0 appends a deterministic ~fill_kb-KB filler paragraph
    per page so text sizes match Common-Crawl-scale documents (the
    benchmark shape); 0 keeps the compact fixture shape used by tests."""
    rng = np.random.default_rng(seed)
    i = np.arange(n_rows)
    host = i % N_HOSTS

    # geotag counts: 40% -> 0, else 1..5
    has = rng.random(n_rows) >= 0.4
    counts = np.where(has, rng.integers(1, 6, n_rows), 0)
    total = int(counts.sum())
    glng, glat = _geotag_coords(rng, total)
    form = rng.integers(0, 2, total)  # 0: "located at", 1: "lat= lng="
    starts = np.concatenate(([0], np.cumsum(counts)))
    # within-page exact duplicates (dedup tests): every 13th page repeats
    # its first geotag in all slots
    for r in range(0, n_rows, 13):
        s, t_ = starts[r], starts[r + 1]
        if t_ - s >= 2:
            glng[s:t_] = glng[s]
            glat[s:t_] = glat[s]

    url = [f"https://site{host[r]}.example/page/{r}" for r in i]
    filler = ["The quick brown fox.", "Nothing to see here.",
              "Weather report and news.", "Archived copy of the page."]
    pool = _filler_pool(fill_kb) if fill_kb > 0 else None
    texts = []
    for r in range(n_rows):
        parts = [f"Page {r} from site{host[r]}."]
        for g in range(starts[r], starts[r + 1]):
            if form[g] == 0:
                parts.append(f"located at {glat[g]},{glng[g]}")
            else:
                parts.append(f"lat={glat[g]} lng={glng[g]}")
            parts.append(filler[g % 4])
        if pool is not None:
            parts.append(pool[r % 8])
        texts.append(" ".join(parts))
    html = [f"<html><body>{t}</body></html>".encode() for t in texts]

    return pa.table({
        "url": pa.array(url, type=pa.string()),
        "warc_ts": pa.array(EPOCH_US + i * 1_000_000,
                            type=pa.timestamp("us")),
        "html": pa.array(html, type=pa.binary()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array([LANGS[r % 4] for r in i], type=pa.string()),
    })


def write_pages(out_dir: str, n_rows: int, seed: int = SEED,
                rows_per_file: int = 50_000, fill_kb: int = 0) -> str:
    """Write pages as a directory of parquet shards; cached (idempotent)."""
    out = pathlib.Path(out_dir)
    marker = out / "_COMPLETE"
    if marker.exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    shard = 0
    for start in range(0, n_rows, rows_per_file):
        n = min(rows_per_file, n_rows - start)
        t = _pages_shard(start, n, seed, fill_kb)
        # small row groups let the reader split a file into many read
        # tasks without re-decoding whole groups (scale: fragment >> core)
        pq.write_table(t, out / f"pages-{shard:05d}.parquet",
                       row_group_size=8192)
        shard += 1
    marker.write_text(f"{n_rows} rows, seed {seed}, fill {fill_kb}kb\n")
    return str(out)


def _pages_shard(start: int, n: int, seed: int, fill_kb: int = 0
                 ) -> pa.Table:
    """Shard [start, start+n) of the logical table; each shard is generated
    with an offset-derived rng so shards are independent of rows_per_file
    only when the full table is materialized via make_pages — for sharded
    writes we instead derive determinism from (seed, start)."""
    t = make_pages(n, seed=seed + start, fill_kb=fill_kb)
    # fix row-dependent columns to global row ids
    i = np.arange(start, start + n)
    url = [f"https://site{r % N_HOSTS}.example/page/{r}" for r in i]
    return pa.table({
        "url": pa.array(url, type=pa.string()),
        "warc_ts": pa.array(EPOCH_US + i * 1_000_000,
                            type=pa.timestamp("us")),
        "html": t["html"],
        "text": t["text"],
        "lang": t["lang"],
    })


def pages_dir_for(n_rows: int, seed: int = SEED, fill_kb: int = 0) -> str:
    """Cached pages dataset under /tmp, keyed by (n, seed, fill)."""
    name = (f"/tmp/geoflow_pages/n{n_rows}_s{seed}" if fill_kb == 0
            else f"/tmp/geoflow_pages/n{n_rows}_s{seed}_f{fill_kb}")
    return write_pages(name, n_rows, seed, fill_kb=fill_kb)


# ---------------------------------------------------------------------------
# polygons (small join side, FIXTURES.md §F4)
# ---------------------------------------------------------------------------

def make_polygons(n: int = 100, seed: int = SEED) -> pa.Table:
    """Seeded polygon set over the test region: convex + concave (star),
    some with holes, some overlapping, plus one large polygon covering the
    hot cluster (id 0)."""
    rng = np.random.default_rng(seed + 1)
    ids, gtypes, coords_col, lengths_col, names = [], [], [], [], []

    def add(pid: int, rings: list[np.ndarray], name: str) -> None:
        flat = np.concatenate([r.ravel() for r in rings])
        ids.append(pid)
        gtypes.append(4)
        coords_col.append(flat)
        lengths_col.append([len(r) for r in rings])
        names.append(name)

    # polygon 0: hot-cluster cover (guarantees a hot join key)
    box = np.array([[HOT_LNG - 1, HOT_LAT - 1], [HOT_LNG + 1, HOT_LAT - 1],
                    [HOT_LNG + 1, HOT_LAT + 1], [HOT_LNG - 1, HOT_LAT + 1],
                    [HOT_LNG - 1, HOT_LAT - 1]])
    add(0, [box], "hot-cover")

    for pid in range(1, n):
        cx = rng.uniform(REGION[0] + 2, REGION[2] - 2)
        cy = rng.uniform(REGION[1] + 2, REGION[3] - 2)
        nv = int(rng.integers(4, 9))
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        shape = pid % 3
        if shape == 0:   # convex-ish
            rad = rng.uniform(0.5, 3.0)
            rr = np.full(nv, rad)
        elif shape == 1:  # concave star
            rr = np.where(np.arange(nv) % 2 == 0,
                          rng.uniform(1.5, 3.0), rng.uniform(0.3, 0.8))
        else:
            rr = rng.uniform(0.5, 2.5, nv)
        xs = cx + rr * np.cos(ang)
        ys = cy + rr * np.sin(ang)
        ring = np.stack([np.append(xs, xs[0]), np.append(ys, ys[0])], axis=1)
        rings = [np.round(ring, 4)]
        if pid % 7 == 0:  # add a hole at half scale
            hx = cx + 0.3 * rr.mean() * np.cos(ang)
            hy = cy + 0.3 * rr.mean() * np.sin(ang)
            hole = np.stack([np.append(hx, hx[0]), np.append(hy, hy[0])],
                            axis=1)
            rings.append(np.round(hole, 4))
        add(pid, rings, f"poly-{pid}")

    return pa.table({
        "poly_id": pa.array(ids, type=pa.int64()),
        "geom_type": pa.array(gtypes, type=pa.int8()),
        "coords": pa.array([c.tolist() for c in coords_col],
                           type=pa.large_list(pa.float64())),
        "lengths": pa.array(lengths_col, type=pa.list_(pa.uint32())),
        "name": pa.array(names, type=pa.string()),
    })


def make_knn_queries(n: int = 50, seed: int = SEED) -> pa.Table:
    """Query points incl. cell-boundary and empty-region cases (§F5)."""
    rng = np.random.default_rng(seed + 2)
    lng = rng.uniform(REGION[0], REGION[2], n)
    lat = rng.uniform(REGION[1], REGION[3], n)
    # cell-boundary cases at res 8 (cell width 1.40625): snap to boundaries
    lng[:5] = np.floor((lng[:5] + 180) / 1.40625) * 1.40625 - 180.0
    lat[5:10] = np.floor((lat[5:10] + 90) / 0.703125) * 0.703125 - 90.0
    # empty-region cases (south pacific)
    lng[10:13] = rng.uniform(-140, -120, 3)
    lat[10:13] = rng.uniform(-55, -45, 3)
    return pa.table({
        "query_id": pa.array(np.arange(n), type=pa.int64()),
        "lng": pa.array(np.round(lng, 4), type=pa.float64()),
        "lat": pa.array(np.round(lat, 4), type=pa.float64()),
        "k": pa.array(rng.integers(1, 21, n), type=pa.int32()),
    })
