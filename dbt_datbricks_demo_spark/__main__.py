from dbt_datbricks_demo_spark.cli import main

raise SystemExit(main())
