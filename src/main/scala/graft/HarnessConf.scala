package graft

/** Shared dev-only harness switches (never set by the driver). */
object HarnessConf {
  /** SPARK_GRAFT_STATESTORE=rocksdb routes streaming state through the
    * RocksDB provider instead of the default HDFS-backed in-memory map.
    * At 100 TB the w-family's session/join state outgrows executor heap
    * and RocksDB (native, spill-to-disk, incremental checkpoints) is
    * the knob a deployment turns; this lets Bench measure what it costs
    * and Verify prove result-parity at scales where state still fits in
    * memory.
    */
  val stateStoreConf: Map[String, String] =
    if (sys.env.get("SPARK_GRAFT_STATESTORE").contains("rocksdb"))
      Map("spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    else Map.empty
}
