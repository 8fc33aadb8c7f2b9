"""Spain national-holiday enumeration.

The reference fills ``ref_holidays`` from the python ``holidays`` package
(dags/mitma/silver_mitma.py:7-52); that package isn't in this image, so the
national fixed-date holidays plus the Easter-derived movable feast (Good
Friday) are computed directly (Anonymous Gregorian computus). Output
matches the reference dim schema: (date DATE, is_holiday BOOLEAN).
"""

from __future__ import annotations

import datetime

FIXED = [
    (1, 1),   # Año Nuevo
    (1, 6),   # Epifanía del Señor
    (5, 1),   # Fiesta del Trabajo
    (8, 15),  # Asunción de la Virgen
    (10, 12), # Fiesta Nacional de España
    (11, 1),  # Todos los Santos
    (12, 6),  # Día de la Constitución
    (12, 8),  # Inmaculada Concepción
    (12, 25), # Navidad
]


def easter_sunday(year: int) -> datetime.date:
    """Anonymous Gregorian computus."""
    a = year % 19
    b, c = divmod(year, 100)
    d, e = divmod(b, 4)
    f = (b + 8) // 25
    g = (b - f + 1) // 3
    h = (19 * a + b - d - g + 15) % 30
    i, k = divmod(c, 4)
    l = (32 + 2 * e + 2 * i - h - k) % 7
    m = (a + 11 * h + 22 * l) // 451
    month, day = divmod(h + l - 7 * m + 114, 31)
    return datetime.date(year, month, day + 1)


def spain_holidays(year: int) -> list[datetime.date]:
    days = [datetime.date(year, m, d) for m, d in FIXED]
    days.append(easter_sunday(year) - datetime.timedelta(days=2))  # Viernes Santo
    return sorted(days)


def holidays_rows(years: list[int]) -> list[tuple[datetime.date, bool]]:
    return [(d, True) for y in years for d in spain_holidays(y)]
