package graft

import java.net.InetSocketAddress
import java.nio.file.{Files, Paths}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Fetch, HttpTransport, Orchestration}

/** Real-HTTP S7 transport against a loopback server (JDK HttpServer —
  * no network egress): index-page scrape, status/empty-body handling,
  * and the full fetchNew integration including retry-on-500 and
  * idempotent re-runs.
  */
class HttpTransportSpec extends AnyFunSuite {

  private def respond(ex: HttpExchange, status: Int,
                      body: Array[Byte]): Unit = {
    ex.sendResponseHeaders(status, if (body.isEmpty) -1 else body.length)
    if (body.nonEmpty) ex.getResponseBody.write(body)
    ex.close()
  }

  private def withServer(test: (HttpServer, String) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    try {
      server.start()
      test(server, s"http://127.0.0.1:${server.getAddress.getPort}/data/")
    } finally server.stop(0)
  }

  test("list scrapes index hrefs, filters by pattern, drops duplicates") {
    withServer { (server, base) =>
      server.createContext("/data/", (ex: HttpExchange) => respond(ex, 200,
        """<html><body><h1>Index of /data</h1>
          |<a href="a.csv">a.csv</a> <a href="b.csv">b.csv</a>
          |<A HREF="a.csv">a.csv again</A>
          |<a href="sub/">sub/</a> <a href="notes.txt">notes.txt</a>
          |</body></html>""".stripMargin.getBytes("UTF-8")))
      val t = new HttpTransport(base, entryPattern = """[^/]+\.csv""".r)
      assert(t.list() === Seq("a.csv", "b.csv"),
        "pattern keeps csv files only; duplicates collapse; dirs drop")
    }
  }

  test("list drops sort links, fragments, and absolute URLs even under " +
    "the permissive default pattern") {
    withServer { (server, base) =>
      server.createContext("/data/", (ex: HttpExchange) => respond(ex, 200,
        """<html><body><h1>Index of /data</h1>
          |<a href="?C=N;O=D">Name</a> <a href="?C=M;O=A">Last modified</a>
          |<a href="a.csv">a.csv</a>
          |<a href="b.csv?download=1">b.csv</a>
          |<a href="#top">top</a>
          |<a href="http://example.com/x.csv">offsite</a>
          |<a href="notes.txt">notes.txt</a>
          |</body></html>""".stripMargin.getBytes("UTF-8")))
      val t = new HttpTransport(base) // default AnyEntry pattern
      assert(t.list() === Seq("a.csv", "notes.txt"),
        "'?'/'#'/':' hrefs can never be plain directory entries")
    }
  }

  test("fetch demands HTTP 200 and a non-empty body") {
    withServer { (server, base) =>
      server.createContext("/data/ok.csv",
        (ex: HttpExchange) => respond(ex, 200, "OK".getBytes("UTF-8")))
      server.createContext("/data/gone.csv",
        (ex: HttpExchange) => respond(ex, 404, Array.empty))
      server.createContext("/data/empty.csv",
        (ex: HttpExchange) => respond(ex, 200, Array.empty))
      val t = new HttpTransport(base)
      assert(new String(t.fetch("ok.csv"), "UTF-8") === "OK")
      val e404 = intercept[IllegalArgumentException](t.fetch("gone.csv"))
      assert(e404.getMessage.contains("404"))
      val eEmpty = intercept[IllegalArgumentException](t.fetch("empty.csv"))
      assert(eEmpty.getMessage.contains("empty body"))
    }
  }

  test("fetch follows a same-origin redirect (Redirect.NORMAL)") {
    withServer { (server, base) =>
      server.createContext("/data/moved.csv", (ex: HttpExchange) => {
        ex.getResponseHeaders.add("Location", base + "here.csv")
        respond(ex, 302, Array.empty)
      })
      server.createContext("/data/here.csv",
        (ex: HttpExchange) => respond(ex, 200, "MOVED".getBytes("UTF-8")))
      val t = new HttpTransport(base)
      assert(new String(t.fetch("moved.csv"), "UTF-8") === "MOVED")
    }
  }

  test("fetchNew over HTTP: staged, retried through a 500, idempotent") {
    withServer { (server, base) =>
      server.createContext("/data/", (ex: HttpExchange) =>
        // the /data/ context is the fallback for unmapped paths too,
        // so serve the index only for the exact directory request
        if (ex.getRequestURI.getPath == "/data/")
          respond(ex, 200,
            """<a href="a.csv">a</a><a href="b.csv">b</a>"""
              .getBytes("UTF-8"))
        else respond(ex, 404, Array.empty))
      server.createContext("/data/a.csv",
        (ex: HttpExchange) => respond(ex, 200, "AAA".getBytes("UTF-8")))
      var bHits = 0
      server.createContext("/data/b.csv", (ex: HttpExchange) => {
        bHits += 1
        if (bHits <= 2) respond(ex, 500, Array.empty)
        else respond(ex, 200, "BBB".getBytes("UTF-8"))
      })
      val t = new HttpTransport(base, entryPattern = """[^/]+\.csv""".r,
        headers = Map("User-Agent" -> "graft-etl"))
      val dir = Files.createTempDirectory("graft_http_fetch")
      val staging = dir.resolve("staging").toString
      val ps = new Orchestration.ProcessedSet(dir.resolve("done.txt").toString)
      val staged = Fetch.fetchNew(() => t.list(), t.fetch, staging, ps,
        maxRetries = 3, baseDelayMs = 1L, sleep = _ => ())
      assert(staged === Seq("a.csv", "b.csv"))
      assert(bHits === 3, "two 500s retried, third attempt succeeded")
      assert(Files.readString(Paths.get(staging, "a.csv")) === "AAA")
      assert(Files.readString(Paths.get(staging, "b.csv")) === "BBB")
      // second pass is a no-op: the processed set already has both
      val again = Fetch.fetchNew(() => t.list(), t.fetch, staging, ps,
        maxRetries = 3, baseDelayMs = 1L, sleep = _ => ())
      assert(again.isEmpty)
    }
  }
}
