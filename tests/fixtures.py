"""Deterministic synthetic fixtures per FIXTURES.md: raw MITMA bronze
rows, INE economy/population CSVs, and a Valencia-ish polygon grid whose
id hierarchy aligns with the MITMA zone ids (FIXTURES §7/§8)."""

from __future__ import annotations

import random

import numpy as np

# 3x3 municipality grid around Valencia (~(-0.4, 39.45)); 5-digit codes.
MUNI_CODES = [f"4625{i}" for i in range(9)]
GRID_ORIGIN = (-0.55, 39.35)
CELL_DEG = 0.15  # ~12.8 km lon / ~16.7 km lat per cell → some pairs >15 km

YEAR = 2023
# 28 days so the Tue-Thu day_type accumulates 12 observations: a 3-sigma
# filter can only ever reject when n >= 11 (max sample z-score is
# (n-1)/sqrt(n), which crosses 3.0 at n=11) — the injected outlier must be
# statistically rejectable.
DATES = [f"202302{d:02d}" for d in range(1, 29)]


def muni_cell(idx: int) -> tuple[float, float]:
    row, col = divmod(idx, 3)
    lon = GRID_ORIGIN[0] + col * CELL_DEG
    lat = GRID_ORIGIN[1] + row * CELL_DEG
    return lon, lat


def square_wkt(lon: float, lat: float, size: float) -> str:
    pts = [
        (lon, lat),
        (lon + size, lat),
        (lon + size, lat + size),
        (lon, lat + size),
        (lon, lat),
    ]
    return "POLYGON ((" + ", ".join(f"{x:.6f} {y:.6f}" for x, y in pts) + "))"


def geometry_rows() -> list[tuple]:
    """silver_geometry_wgs84-shaped rows (FIXTURES §7): 2 sections per
    municipality, adjacent squares; section/district prefixes align."""
    rows = []
    for i, muni in enumerate(MUNI_CODES):
        lon, lat = muni_cell(i)
        district = muni + "01"
        for s in range(2):
            section = district + f"{s + 1:03d}"
            half = CELL_DEG / 2
            wkt = square_wkt(lon + s * half, lat, half)
            rows.append((wkt, section, district, muni, "46", "10", YEAR))
    return rows


GEOMETRY_COLUMNS = [
    "geom", "CUSEC", "CUDIS", "CUMUN", "CPRO", "CCA", "year_hint",
]


def mitma_bronze_rows(seed: int = 42) -> dict[str, list[tuple]]:
    """Raw all-string MITMA rows per date (FIXTURES §1): zone ids are
    section ids (10-digit, first 5 = municipality); includes _AM/_AD
    suffixes, PT/FR/externo rows, malformed dates/hours/trips, and an
    injected 10σ outlier per (hour, O, D) group."""
    rng = random.Random(seed)
    zones = [m + "01" + f"{s + 1:03d}" for m in MUNI_CODES for s in range(2)]
    out: dict[str, list[tuple]] = {}
    for date in DATES:
        rows = []
        # dests zones[2:8] overlap the origin municipalities so OD pairs
        # span both sides of the 15 km long-trip cutoff (FIXTURES §8).
        for hour in (7, 8, 18):
            for o in zones[:6]:
                for d in zones[2:8]:
                    trips = round(50 + 10 * rng.random(), 2)
                    o_out = o + "_AM" if rng.random() < 0.1 else o
                    d_out = d + "_AD" if rng.random() < 0.1 else d
                    rows.append(_bronze_row(date, str(hour), o_out, d_out, str(trips)))
        # cross-border / externo rows → filtered in silver
        rows.append(_bronze_row(date, "8", "PT12345", zones[0], "10.0"))
        rows.append(_bronze_row(date, "8", zones[0], "FR99999", "10.0"))
        rows.append(_bronze_row(date, "8", "externo", zones[1], "10.0"))
        # malformed rows → TRY_CAST/strptime NULL path
        rows.append(_bronze_row("2023-02-31x", "8", zones[0], zones[1], "5.0"))
        rows.append(_bronze_row(date, "notanhour", zones[0], zones[1], "5.0"))
        rows.append(_bronze_row(date, "8", zones[0], zones[1], "notanumber"))
        out[date] = rows
    # extreme outlier appended to an existing (hour, O, D) group on the
    # last date (2023-02-28, a Tuesday -> the 12-observation Tue-Thu group)
    out[DATES[-1]].append(_bronze_row(DATES[-1], "7", zones[0], zones[2], "100000.0"))
    return out


def _bronze_row(date: str, hour: str, o: str, d: str, trips: str) -> tuple:
    return (
        date, hour, o, d, "005-010", "home", "work", "1", "1", "46",
        "10-15", "25-45", "M", trips, "100.0",
    )


def economy_csv_rows() -> list[str]:
    """INE-style semicolon CSV (FIXTURES §5 raw variant): '<code> <name>'
    columns + Spanish-locale Total."""
    lines = ["Municipios;Distritos;Secciones;Periodo;Total"]
    rng = random.Random(7)
    for i, muni in enumerate(MUNI_CODES):
        district = muni + "01"
        for s in range(2):
            section = district + f"{s + 1:03d}"
            income = f"{rng.randint(8, 40)}.{rng.randint(100, 999)},{rng.randint(10, 99)}"
            lines.append(
                f"{muni} Municipio{i};{district} distrito 01;{section} sección {s + 1:03d};"
                f"{YEAR};{income}"
            )
    # a junk row (ignore_errors path)
    lines.append("garbage;;;;no-number")
    return lines


def population_csv_rows() -> list[str]:
    lines = ["Municipios;Sexo;Edad (grandes grupos);Periodo;Total"]
    rng = random.Random(9)
    for i, muni in enumerate(MUNI_CODES):
        total = 0
        for sexo in ("Hombres", "Mujeres"):
            for edad in ("0-15", "16-64", "65+"):
                n = rng.randint(1000, 9999)
                total += n
                lines.append(f"{muni} Municipio{i};{sexo};{edad};1 de enero de {YEAR};{n:,}".replace(",", "."))
        lines.append(f"{muni} Municipio{i};Total;Todas las edades;1 de enero de {YEAR};{total}")
    return lines
