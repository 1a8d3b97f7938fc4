package graft.util

/** Timeout hardening for single-JVM (`local[n]`) sessions on a
  * shared-tenancy host.
  *
  * In local mode the driver and its one executor share a JVM, so
  * executor heartbeats carry zero crash-detection value — but they can
  * still KILL the process: a host vCPU-starvation burst longer than
  * `spark.network.timeout` (120 s default; this host freezes whole-guest
  * for >129 s under tenancy bursts, see BENCH.md "host noise") makes
  * HeartbeatReceiver deregister the in-process executor, every later
  * heartbeat is rejected ("Inbox: Ignoring error" every 10 s), and after
  * `spark.executor.heartbeat.maxFailures` (60) consecutive rejections
  * the executor calls System.exit(56) (ExecutorExitCode
  * .HEARTBEAT_FAILURE) — stopping the SparkContext mid-suite ~10 min
  * after the burst. Reproduced on a full 51-query bench run (the burst
  * hit during stages warmup; 22 queries were lost to "Cannot call
  * methods on a stopped SparkContext"), and the same signature —
  * shutdown hook + stopped-context failures on the last queries —
  * matches the round-3 driver bench loss.
  *
  * There is nothing to detect: if the local executor dies the JVM is
  * already gone. So make the heartbeat chain starvation-proof. On a
  * real (multi-host) cluster these values would mask genuine executor
  * loss, so `resilienceFor` hands them out only for single-host
  * masters — a remote-master deployment gets Spark's defaults.
  */
object LocalHardening {

  /** The starvation-proof timeout set for `master`, or empty when the
    * master is not a single-HOST one. The guard is load-bearing
    * (round-4 VERDICT "What's wrong" #4): on a REAL cluster these
    * 1 h timeouts would mask genuine executor loss for an hour, so a
    * deployment against yarn / k8s / standalone must not be able to
    * inherit them by reusing a builder written for the local harness.
    * `local-cluster[...]` (the pseudo-cluster scaling ladder) IS
    * matched: its executor JVMs live on this same host and freeze WITH
    * the driver during a tenancy burst — exactly the spurious-expiry
    * failure mode the timeouts exist to absorb (and the precedent the
    * round-4 ladder evidence was measured under).
    */
  def resilienceFor(master: String): Map[String, String] =
    if (master == "local" || master.startsWith("local[") ||
      master.startsWith("local-cluster[")) resilience
    else Map.empty

  private val resilience: Map[String, String] = Map(
    // HeartbeatReceiver's executor-expiry threshold (and the shared RPC
    // ask timeout — no cross-node fetches exist in one JVM, so safe).
    "spark.network.timeout" -> "3600s",
    // Must stay well under the timeout; 60 s also cuts heartbeat RPC
    // noise and makes maxFailures-worth of rejections take 60 min.
    "spark.executor.heartbeatInterval" -> "60s",
    // Broadcast-exchange build timeout, 300 s default — this host has
    // measured starvation windows >300 s (BENCH.md: a 351 s query that
    // runs 25-59 s healthy), which would fail any broadcast join whose
    // build straddles one. Same reasoning as above: in one JVM a slow
    // broadcast is starvation, not a lost node.
    "spark.sql.broadcastTimeout" -> "3600")
}
