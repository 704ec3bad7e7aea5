"""Audit every registered query's output schema for canonicalizer-hostile
columns (array/map/struct — pandas sort_values cannot factorize them) and
smoke-run each builder at sf0.001.

Run:  python tools/audit_schemas.py
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.types import ArrayType, MapType, StructType  # noqa: E402

from ds_ga1004_bigdata_project_spark.queries import REGISTRY  # noqa: E402
from ds_ga1004_bigdata_project_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("AUDIT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_session()
    bad: list[str] = []
    errs: list[str] = []
    for name, q in REGISTRY.items():
        try:
            df = q.build(spark, SF_DIR)
            hostile = [
                f.name for f in df.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            if hostile:
                bad.append(f"{name}: {hostile}")
                print(f"HOSTILE {name}: {hostile}", flush=True)
            else:
                print(f"ok      {name}", flush=True)
        except Exception:
            errs.append(name)
            print(f"ERROR   {name}\n{traceback.format_exc()}", flush=True)
        spark.catalog.clearCache()
    print("\n=== SUMMARY ===")
    print(f"hostile: {bad}")
    print(f"errors:  {errs}")


if __name__ == "__main__":
    main()
