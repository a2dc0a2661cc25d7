"""``python -m nextbus2pg_spark`` — the reference's run.py CLI
(``/root/reference/run.py:35-57``) on the Spark engine."""

from nextbus2pg_spark.pipelines.app import main

if __name__ == "__main__":
    main()
