package graft.api

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder
import scala.jdk.CollectionConverters._

/** Engine usage metrics — who queries the analytics service, from where,
  * how often (`analytics/UsageMetrics.java:39-152`,
  * `UserMetrics.java:26-100`): per-user login / logout / query counters
  * keyed by client IP, rendered as the same JSON shape the reference's
  * front-end consumes.
  *
  * The transport layer (servlet request, X-Real-IP / X-Forwarded-For
  * resolution) is the caller's concern — SURVEY §2.11 scopes the HTTP
  * surface out — so events arrive as plain (user, ip) pairs. Counters are
  * `LongAdder`s under striped maps instead of the reference's fully
  * `synchronized` methods: concurrent queries don't serialize on a lock.
  */
object UsageMetrics {

  final class UserMetrics private[UsageMetrics] (val userName: String) {
    private[UsageMetrics] val queries = new ConcurrentHashMap[String, LongAdder]()
    private[UsageMetrics] val logins = new ConcurrentHashMap[String, LongAdder]()
    private[UsageMetrics] val logouts = new ConcurrentHashMap[String, LongAdder]()

    private def bump(m: ConcurrentHashMap[String, LongAdder], ip: String): Unit =
      m.computeIfAbsent(ip, _ => new LongAdder).increment()

    def loggedIn(ip: String): Unit = bump(logins, ip)
    def loggedOut(ip: String): Unit = bump(logouts, ip)
    def queried(ip: String): Unit = bump(queries, ip)

    def queryCounts: Map[String, Long] =
      queries.asScala.map { case (k, v) => k -> v.sum() }.toMap
    def loginCounts: Map[String, Long] =
      logins.asScala.map { case (k, v) => k -> v.sum() }.toMap
    def logoutCounts: Map[String, Long] =
      logouts.asScala.map { case (k, v) => k -> v.sum() }.toMap
  }

  private val users = new ConcurrentHashMap[String, UserMetrics]()

  private def user(name: String): UserMetrics =
    users.computeIfAbsent(name, new UserMetrics(_))

  def userLoggedIn(name: String, ip: String): Unit = user(name).loggedIn(ip)
  def userLoggedOut(name: String, ip: String): Unit = user(name).loggedOut(ip)
  def userMadeQuery(name: String, ip: String): Unit = user(name).queried(ip)

  /** `{"users": [{"userName": …, "queryCountsByIp": {…}, …}, …]}` —
    * the reference's front-end JSON shape, users and IPs sorted for
    * deterministic output. */
  def userMetricsJson: String = {
    def obj(m: Map[String, Long]): String =
      m.toSeq.sorted.map { case (ip, n) => s""""$ip": $n""" }
        .mkString("{", ", ", "}")
    val list = users.asScala.toSeq.sortBy(_._1).map { case (name, u) =>
      s"""{"userName": "$name", "queryCountsByIp": ${obj(u.queryCounts)}, """ +
      s""""loginCountsByIp": ${obj(u.loginCounts)}, """ +
      s""""logoutCountsByIp": ${obj(u.logoutCounts)}}"""
    }
    s"""{"users": [${list.mkString(", ")}]}"""
  }

  def clear(): Unit = users.clear()
}
