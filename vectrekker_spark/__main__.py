from vectrekker_spark.cli import main

raise SystemExit(main())
