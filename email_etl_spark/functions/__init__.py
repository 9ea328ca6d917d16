"""Pure-column expression kits. Everything here returns Column
expressions built from pyspark.sql.functions so the work stays inside
whole-stage codegen on the JVM — no Python in the hot path."""
