"""Storage-layout helpers: partitioned and bucketed columnar stores."""
