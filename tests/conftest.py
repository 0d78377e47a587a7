"""Shared fixtures: one local SparkSession, the synthetic ZTM feed tree
(per FIXTURES.md — nulls, blanks, mode ties, shared stop names, duplicate
rows across files), and a DuckDB connection for oracle comparisons.
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pytest

from idh_etl_demo_spark.session import get_spark

DAY = dt.date(2024, 12, 25)  # the reference's replay day (a Wednesday)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="idh-etl-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g", "spark.sql.codegen.wholeStage": "true"},
    )
    yield s


@pytest.fixture(scope="session")
def ducks():
    con = duckdb.connect()
    yield con
    con.close()


ROUTES = [
    # route_id, route_type  (0=tram 2=rail 3=bus, 11→unknown)
    ("1", 0),
    ("2", 2),
    ("3", 3),
    ("N5", 11),
    ("X9", 3),  # no trips at all → coalesce(…, 0) path
]

TRIPS = [
    ("1", "t1"),
    ("1", "t2"),
    ("1", "t3"),
    ("2", "t4"),
    ("2", "t5"),
    ("3", "t6"),  # trip with NO stop_times rows
    ("N5", "t7"),
]

STOPS = [
    # stop_id, stop_name, lat, lon — s4/s5 share a display name (join fan-out)
    ("s1", "Plac Solidarnosci", "54.360", "18.640"),
    ("s2", "Brama Wyzynna", "54.351", "18.645"),
    ("s3", "Opera Baltycka", "54.370", "18.620"),
    ("s4", "Dworzec Glowny", "54.355", "18.644"),
    ("s5", "Dworzec Glowny", "54.356", "18.646"),
    ("s6", "Zaspa", "54.382", "18.605"),
    ("s7", "Oliwa", "54.410", "18.560"),
    ("s8", "Wrzeszcz", "54.395", "18.600"),
]

STOP_TIMES = [
    # trip_id, stop_id, shape_dist_traveled
    # route 1: trip lens t1=10.0, t2=12.0, t3=12.0 → mode 12.0
    ("t1", "s1", 0.0), ("t1", "s2", 5.0), ("t1", "s3", 10.0),
    ("t2", "s1", 0.0), ("t2", "s2", 12.0),
    ("t3", "s2", 3.0), ("t3", "s3", 12.0),
    # route 2: t4=5.0, t5=7.0 → frequency tie, higher value (7.0) wins
    ("t4", "s4", 5.0),
    ("t5", "s5", 7.0),
    # t6 (route 3) intentionally absent; t7 (N5) has stops but null dist
    ("t7", "s6", None), ("t7", "s7", None), ("t7", "s6", None),
]

VEHICLES = [
    # vehicle_number, manufacturer, type, production_year, carrier
    ("v100", "Solaris", "Urbino 12", "2015", "GAiT"),
    ("v101", "Solaris", "Urbino 18", "2016", "GAiT"),
    ("v102", "Mercedes", "Citaro", "2018", "BP Tour"),
    ("v103", "Pesa", "Swing", "2012", "GAiT"),
    ("v104", "Pesa", "Jazz", "2015a", "GAiT"),      # dirty year → filtered
    ("v105", "Duewag", "N8C", "n/a", "GAiT"),        # dirty year → filtered
    ("v106", "Solaris", "Urbino 12", None, "GAiT"),  # null year → filtered
    (None, "Solaris", "Urbino 12", "2019", "GAiT"),  # null number → filtered
    ("  ", "Solaris", "Urbino 12", "2019", "GAiT"),  # blank number → filtered
    ("v107", "", "Urbino 12", "2019", "GAiT"),       # blank brand → filtered
    ("v108", "Solaris", None, "2019", "GAiT"),       # null type → filtered
    ("v109", "Skoda", "Artic", "2021", "BP Tour"),
]

# Two delay files; one row duplicated across both (cross-file dedup), one
# early ("przed czasem"), one zero, blank/missing vehicle numbers.
DELAYS_FILE_A = [
    ("2024-12-25T07:14:05", "7 min", "1", "Plac Solidarnosci", "v100"),
    ("2024-12-25T07:40:00", "3 min przed czasem", "1", "Brama Wyzynna", "v101"),
    ("2024-12-25T08:02:30", "0 min", "2", "Dworzec Glowny", "v103"),
    ("2024-12-25T08:15:00", "12 min", "3", "Zaspa", "v102"),
    ("2024-12-25T09:05:00", "4 min", "1", "Opera Baltycka", ""),  # blank vehicle
    ("2024-12-25T09:59:59", "2 min", "N5", "Oliwa", "v109"),
]
DELAYS_FILE_B = [
    ("2024-12-25T08:02:30", "0 min", "2", "Dworzec Glowny", "v103"),  # dup of A row
    ("2024-12-25T13:20:00", "5 min", "2", "Dworzec Glowny", "v109"),
    ("2024-12-25T14:45:10", "1 min przed czasem", "3", "Wrzeszcz", "v100"),
    ("2024-12-25T18:30:00", "9 min", "1", "Plac Solidarnosci", "v101"),
    ("2024-12-25T23:10:00", "6 min", "N5", "Oliwa", None),  # missing vehicle
]

# Weather: station 12375 hours 0..23; a second station (99999) that shares
# hours with 12375 (the reference's cross-file hour-dedup quirk drops it);
# nulls for temperature/wind (filtered), precip (→0), pressure (→1013);
# single-digit hours exercise the zero-pad; one hour duplicated across
# files with identical content.
def _weather_rows():
    rows = []
    for h in range(24):
        temp = [-3.0, 1.5, 2.0, 4.0, 9.9, 10.0, 15.0, 25.0, 26.0, 36.0][h % 10]
        if h == 21:
            temp = None  # surviving null-temperature hour → row filtered out
        precip = [0.0, 0.2, 5.4, 6.1, None, 0.0, 1.2, 8.3, 0.0, 2.2][h % 10]
        wind = [1.0, 4.9, 5.0, 9.9, 10.0, 14.9, 15.1, 20.0, 3.0, 7.0][h % 10]
        if h == 19:
            wind = None  # surviving null-wind hour → row filtered out
        hum = [50.0, 69.9, 70.0, 85.0, 90.0, 90.1, 95.0, 60.0, 75.0, 88.0][h % 10]
        press = [990.0, None, 1013.2, 1020.7, 1005.0, 998.4, None, 1011.0, 1017.3, 1002.8][h % 10]
        rows.append(("12375", "2024-12-25", h, temp, precip, wind, (h * 37) % 360, hum, press))
    rows.append(("99999", "2024-12-25", 3, 7.7, 0.0, 2.0, 90, 55.0, 1000.0))  # dropped by hour-dedup
    rows.append(("12375", "2024-12-25", 20, None, 0.0, 2.0, 10, 50.0, 1000.0))  # null temp — but hour 20 dup!
    return rows


def _write_csv(path: str, header: list[str], rows) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(",".join(header) + "\n")
        for r in rows:
            f.write(",".join("" if v is None else str(v) for v in r) + "\n")


@pytest.fixture(scope="session")
def ztm_root(tmp_path_factory) -> str:
    root = str(tmp_path_factory.mktemp("ztm_data"))
    day = "2024/12/25"
    _write_csv(f"{root}/gtfs/{day}/routes.csv", ["route_id", "route_type"], ROUTES)
    _write_csv(f"{root}/gtfs/{day}/trips.csv", ["route_id", "trip_id"], TRIPS)
    _write_csv(
        f"{root}/gtfs/{day}/stops.csv",
        ["stop_id", "stop_name", "stop_lat", "stop_lon"],
        STOPS,
    )
    _write_csv(
        f"{root}/gtfs/{day}/stop_times.csv",
        ["trip_id", "stop_id", "shape_dist_traveled"],
        STOP_TIMES,
    )
    _write_csv(
        f"{root}/delays/{day}/delays_a.csv",
        ["Timestamp", "Delay", "Route", "Stop Name", "Vehicle No"],
        DELAYS_FILE_A,
    )
    _write_csv(
        f"{root}/delays/{day}/delays_b.csv",
        ["Timestamp", "Delay", "Route", "Stop Name", "Vehicle No"],
        DELAYS_FILE_B,
    )
    weather_rows = _weather_rows()
    header = [
        "id_stacji", "data_pomiaru", "godzina_pomiaru", "temperatura",
        "suma_opadu", "predkosc_wiatru", "kierunek_wiatru",
        "wilgotnosc_wzgledna", "cisnienie",
    ]
    _write_csv(f"{root}/weather/{day}/weather_a.csv", header, weather_rows[:13])
    # file b re-ships hour 12 (identical row) + the rest
    _write_csv(
        f"{root}/weather/{day}/weather_b.csv", header, [weather_rows[12]] + weather_rows[13:]
    )
    _write_csv(
        f"{root}/ztm_vehicles_detailed.csv",
        ["vehicle_number", "manufacturer", "type", "production_year", "carrier"],
        VEHICLES,
    )
    return root
