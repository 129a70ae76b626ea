package graft

import java.net.InetSocketAddress
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Minimal in-JVM WebHDFS REST endpoint backed by a local directory — the
  * sandbox stand-in for a remote object store: no hadoop-aws jar (and no
  * network) exists here, so the s3a:// path cannot run, but Hadoop's
  * `WebHdfsFileSystem` ships in hadoop-client-runtime and speaks plain HTTP.
  * Serving the WebHDFS protocol from this stub lets the golden e2e exercise
  * the Connector over a REAL remote-scheme FileSystem — redirect-based
  * writes, ranged reads, list/rename/delete through HTTP — which is the
  * code path a `s3a://bucket` deployment takes (URI-scheme-resolved FS, no
  * local special-casing), minus only the AWS SDK transport.
  *
  * Implements exactly the operations the job needs: GETFILESTATUS,
  * LISTSTATUS, OPEN (with offset/length — parquet footer reads seek),
  * CREATE (the 307 two-step dance), MKDIRS, RENAME (the commit protocol),
  * DELETE, APPEND not included.
  */
final class WebHdfsStub(root: Path) {

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/webhdfs/v1", (ex: HttpExchange) => handle(ex))
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))

  def port: Int = server.getAddress.getPort
  def uri: String = s"webhdfs://127.0.0.1:$port"
  def start(): Unit = server.start()
  def stop(): Unit = server.stop(0)

  // ------------------------------------------------------------- plumbing
  private def params(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("")
      .split("&").filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) kv -> ""
        else java.net.URLDecoder.decode(kv.take(i), "UTF-8") ->
          java.net.URLDecoder.decode(kv.drop(i + 1), "UTF-8")
      }.toMap

  private def remotePath(ex: HttpExchange): String =
    ex.getRequestURI.getPath.stripPrefix("/webhdfs/v1")

  private def local(remote: String): Path =
    Paths.get(root.toString, remote.split("/").filter(_.nonEmpty): _*)

  private def send(ex: HttpExchange, code: Int, body: Array[Byte],
      contentType: String = "application/json"): Unit = {
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
    if (body.nonEmpty) ex.getResponseBody.write(body)
    ex.close()
  }

  private def sendJson(ex: HttpExchange, code: Int, json: String): Unit =
    send(ex, code, json.getBytes("UTF-8"))

  private def notFound(ex: HttpExchange, p: String): Unit =
    sendJson(ex, 404,
      s"""{"RemoteException":{"exception":"FileNotFoundException",
         |"javaClassName":"java.io.FileNotFoundException",
         |"message":"File does not exist: $p"}}""".stripMargin.replace("\n", ""))

  private def statusJson(f: Path, suffix: String): String = {
    val isDir = Files.isDirectory(f)
    val len = if (isDir) 0L else Files.size(f)
    val mtime = Files.getLastModifiedTime(f).toMillis
    s"""{"accessTime":$mtime,"blockSize":134217728,"childrenNum":0,""" +
      s""""fileId":0,"group":"supergroup","length":$len,""" +
      s""""modificationTime":$mtime,"owner":"graft","pathSuffix":"$suffix",""" +
      s""""permission":"${if (isDir) "755" else "644"}","replication":1,""" +
      s""""storagePolicy":0,"type":"${if (isDir) "DIRECTORY" else "FILE"}"}"""
  }

  // ------------------------------------------------------------- handler
  private def handle(ex: HttpExchange): Unit =
    try {
      val q = params(ex)
      val rp = remotePath(ex)
      val lp = local(rp)
      val op = q.getOrElse("op", "").toUpperCase
      op match {
        case "GETFILESTATUS" =>
          if (!Files.exists(lp)) notFound(ex, rp)
          else sendJson(ex, 200, s"""{"FileStatus":${statusJson(lp, "")}}""")

        case "LISTSTATUS" =>
          if (!Files.exists(lp)) notFound(ex, rp)
          else {
            val entries =
              if (Files.isDirectory(lp))
                Files.list(lp).toArray.map(_.asInstanceOf[Path]).sortBy(_.getFileName.toString)
                  .map(c => statusJson(c, c.getFileName.toString))
              else Array(statusJson(lp, ""))
            sendJson(ex, 200,
              s"""{"FileStatuses":{"FileStatus":[${entries.mkString(",")}]}}""")
          }

        case "OPEN" =>
          if (!Files.exists(lp)) notFound(ex, rp)
          else {
            // direct 200 (no datanode redirect needed): honor offset/length —
            // parquet reads its footer with ranged OPENs
            val bytes = Files.readAllBytes(lp)
            val off = q.get("offset").map(_.toLong).getOrElse(0L)
              .min(bytes.length.toLong).toInt
            val len = q.get("length").map(_.toLong)
              .getOrElse(bytes.length.toLong - off)
              .min(bytes.length.toLong - off).toInt
            send(ex, 200, java.util.Arrays.copyOfRange(bytes, off, off + len),
              "application/octet-stream")
          }

        case "CREATE" =>
          if (!q.contains("data")) {
            // step 1 of the WebHDFS write dance: redirect to the "datanode"
            val loc = s"http://127.0.0.1:$port/webhdfs/v1$rp?op=CREATE&data=true"
            ex.getResponseHeaders.set("Location", loc)
            ex.sendResponseHeaders(307, -1)
            ex.close()
          } else {
            Files.createDirectories(lp.getParent)
            val in = ex.getRequestBody
            Files.copy(in, lp, StandardCopyOption.REPLACE_EXISTING)
            in.close()
            ex.getResponseHeaders.set("Location", s"webhdfs://127.0.0.1:$port$rp")
            ex.sendResponseHeaders(201, -1)
            ex.close()
          }

        case "MKDIRS" =>
          Files.createDirectories(lp)
          sendJson(ex, 200, """{"boolean":true}""")

        case "DELETE" =>
          val ok =
            if (!Files.exists(lp)) false
            else {
              if (q.get("recursive").contains("true") && Files.isDirectory(lp)) {
                Files.walk(lp).sorted(java.util.Comparator.reverseOrder())
                  .forEach(p => Files.delete(p))
              } else Files.delete(lp)
              true
            }
          sendJson(ex, 200, s"""{"boolean":$ok}""")

        case "RENAME" =>
          val dst = local(q("destination"))
          val ok = Files.exists(lp) && {
            Files.createDirectories(dst.getParent)
            Files.move(lp, dst, StandardCopyOption.REPLACE_EXISTING)
            true
          }
          sendJson(ex, 200, s"""{"boolean":$ok}""")

        case "GETFILEBLOCKLOCATIONS" | "GET_BLOCK_LOCATIONS" =>
          // scan planning asks for locality; one synthetic local block
          if (!Files.exists(lp)) notFound(ex, rp)
          else {
            val len = if (Files.isDirectory(lp)) 0L else Files.size(lp)
            val block =
              s"""{"cachedHosts":[],"corrupt":false,"hosts":["localhost"],""" +
                s""""length":$len,"names":["127.0.0.1:$port"],"offset":0,""" +
                s""""storageTypes":["DISK"],"topologyPaths":["/default-rack/127.0.0.1:$port"]}"""
            // older clients use op=GET_BLOCK_LOCATIONS (LocatedBlocks form),
            // newer use GETFILEBLOCKLOCATIONS (BlockLocations form) and fall
            // back on a 400 for the other — serve the one matching the op
            if (op == "GETFILEBLOCKLOCATIONS")
              sendJson(ex, 200, s"""{"BlockLocations":{"BlockLocation":[$block]}}""")
            else
              sendJson(ex, 200,
                s"""{"LocatedBlocks":{"fileLength":$len,"isLastBlockComplete":true,""" +
                  s""""isUnderConstruction":false,"lastLocatedBlock":null,"locatedBlocks":[]}}""")
          }

        case other =>
          sendJson(ex, 400,
            s"""{"RemoteException":{"exception":"UnsupportedOperationException",
               |"javaClassName":"java.lang.UnsupportedOperationException",
               |"message":"op $other not implemented in stub"}}"""
              .stripMargin.replace("\n", ""))
      }
    } catch {
      case t: Throwable =>
        try sendJson(ex, 500,
          s"""{"RemoteException":{"exception":"IOException",
             |"javaClassName":"java.io.IOException",
             |"message":"${t.toString.replace("\"", "'")}"}}"""
            .stripMargin.replace("\n", ""))
        catch { case _: Throwable => () }
    }
}
