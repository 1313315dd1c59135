package graft

import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch}

import graft.cdc.{ChangeFeed, ConsumerStateStore, InvoiceCdc}

/** T8 under real concurrency — the reference's deployment shape is N
  * consumers fanning out over ONE changefeed through one API server
  * (server.js holds one ChangeTrackingSyncState table for all of
  * them), so two consumers polling AT THE SAME TIME is the normal
  * case. The sequential T8 test (ExactlyOnceSpec) proves cursor
  * independence; this suite proves it holds when the polls interleave
  * on threads sharing one ConsumerStateStore — which is only true
  * because the store serializes its read-modify-write of the shared
  * state file (without the store-level monitor, consumer A's commit
  * can be read-modify-written away under consumer B's and A silently
  * re-delivers or, worse, A's auto-create drops B's row entirely).
  *
  * Assertions, valid under EVERY interleaving:
  *  - each consumer's union-of-pages is exactly the full feed key set
  *    (no loss, no duplicate across that consumer's pages),
  *  - final cursors are independent and correct per consumer,
  *  - a reset of one mid-flight consumer never disturbs the others'
  *    cursors or deliveries.
  */
class ConcurrentFanoutSpec extends SparkSpec {
  import spark.implicits._

  private def fullKeySet: Set[(Long, Long)] =
    InvoiceCdc.changedInvoices(spark, sf, 0L, Long.MaxValue)
      .select($"invoice_id", $"change_version")
      .as[(Long, Long)].collect().toSet

  test("T8: concurrent consumers drain one feed with interleaved polls " +
      "and a mid-flight reset — isolation and identical union-of-pages") {
    val store = new ConsumerStateStore(spark, tmpDir("fanout-state"))
    val feed = new ChangeFeed(spark, sf, store)
    val expected = fullKeySet
    assert(expected.nonEmpty, "feed must be non-empty for this test")
    val maxVersion = expected.map(_._2).max

    // Different page sizes force different poll counts, so the two
    // drains genuinely interleave commits on the shared state file.
    val configs = Seq("alpha" -> 120, "beta" -> 70, "gamma" -> 260)
    val delivered = configs.map { case (name, _) =>
      name -> new ConcurrentLinkedQueue[(Long, Long)]()
    }.toMap
    val start = new CountDownLatch(1)
    val failures = new ConcurrentLinkedQueue[Throwable]()
    val threads = configs.map { case (name, limit) =>
      new Thread(() => {
        try {
          start.await()
          feed.drain(name, limit) { df =>
            df.select($"invoice_id", $"change_version")
              .as[(Long, Long)].collect()
              .foreach(delivered(name).add)
          }
          // gamma resets itself mid-flight (while the others may still
          // be polling) and re-drains from version 0: the second pass
          // must see the whole feed again, and nobody else notices.
          if (name == "gamma") {
            delivered(name).clear()
            feed.resetConsumer(name)
            assert(store.get(name).lastSyncVersion == 0L)
            feed.drain(name, limit) { df =>
              df.select($"invoice_id", $"change_version")
                .as[(Long, Long)].collect()
                .foreach(delivered(name).add)
            }
          }
        } catch { case t: Throwable => failures.add(t) }
      }, s"fanout-$name")
    }
    threads.foreach(_.start())
    start.countDown()
    threads.foreach(_.join(300000))
    assert(failures.isEmpty,
      s"consumer thread failed: ${Option(failures.peek()).map(_.toString)}")

    for ((name, _) <- configs) {
      val got = delivered(name)
      val asSeq = got.toArray(Array.empty[(Long, Long)]).toSeq
      assert(asSeq.size == asSeq.toSet.size,
        s"$name delivered a duplicate key across its pages")
      assert(asSeq.toSet == expected,
        s"$name union-of-pages != full feed " +
          s"(missing ${(expected -- asSeq.toSet).size}, " +
          s"extra ${(asSeq.toSet -- expected).size})")
      // every cursor ends at the feed head, independently
      assert(store.get(name).lastSyncVersion == maxVersion,
        s"$name cursor did not end at the feed head")
    }
    // the state file holds exactly the three rows, none lost to a
    // concurrent read-modify-write (the auto-create / commit race)
    assert(store.list().map(_.syncName).sorted ==
      configs.map(_._1).sorted)
  }

  test("T8: store-level mutual exclusion — concurrent commits on " +
      "distinct consumers never lose an update") {
    val store = new ConsumerStateStore(spark, tmpDir("fanout-rmw"))
    val names = (0 until 8).map(i => s"c$i")
    names.foreach(store.get(_)) // auto-create all rows first
    val start = new CountDownLatch(1)
    val failures = new ConcurrentLinkedQueue[Throwable]()
    val threads = names.zipWithIndex.map { case (name, i) =>
      new Thread(() => {
        try {
          start.await()
          // each consumer walks its own version chain; interleaved
          // whole-file rewrites must preserve every other row
          for (v <- 1 to 25) store.commit(name, v.toLong * (i + 1), v.toLong)
        } catch { case t: Throwable => failures.add(t) }
      }, s"rmw-$name")
    }
    threads.foreach(_.start())
    start.countDown()
    threads.foreach(_.join(120000))
    assert(failures.isEmpty,
      s"commit thread failed: ${Option(failures.peek()).map(_.toString)}")
    val finals = store.list().map(s => s.syncName -> s.lastSyncVersion).toMap
    assert(finals.keySet == names.toSet, "a consumer row was lost")
    for ((name, i) <- names.zipWithIndex)
      assert(finals(name) == 25L * (i + 1),
        s"$name final version ${finals(name)} != ${25L * (i + 1)} — " +
          "a commit was lost under a concurrent writer")
  }
}
