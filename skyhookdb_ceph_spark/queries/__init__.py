"""Query modules. Each module registers SURVEY.md §2 QueryIDs via
skyhookdb_ceph_spark.registry.query — importing a module is what makes
its queries visible to the driver contract (registry.load_all)."""
