from i2o_transform_spark.sources.tables import (  # noqa: F401
    TESTDATA_TABLES,
    load_table,
    load_testdata,
    write_table,
)
