package com.lancedb_tpu;

import java.io.IOException;
import java.net.URI;
import java.net.URLEncoder;
import java.net.http.HttpClient;
import java.net.http.HttpRequest;
import java.net.http.HttpResponse;
import java.nio.charset.StandardCharsets;
import java.time.Duration;
import java.util.UUID;

/**
 * Thin Java client for the lancedb-tpu query server — the parity
 * surface of the reference's Java namespace client (reference java/:
 * LanceDbNamespaceClientBuilder builds a REST catalog client; here the
 * catalog and table ops share one REST server).
 *
 * JSON requests and responses are passed as raw strings so the client
 * has zero dependencies; decode Arrow IPC query responses with the
 * optional {@code org.apache.arrow:arrow-vector} artifact.
 *
 * <pre>{@code
 * LanceDbTpuClient db = LanceDbTpuClient.builder()
 *     .baseUrl("http://127.0.0.1:8787")
 *     .build();
 * String tables = db.tableNames();              // {"tables": [...]}
 * String desc = db.describe("items");           // schema + stats JSON
 * byte[] ipc = db.query("items", "{\"vector\": [0.1, 0.2], \"k\": 5}");
 * }</pre>
 */
public final class LanceDbTpuClient {
  private final HttpClient http;
  private final String baseUrl;
  private final Duration timeout;
  private final String apiKey;

  private LanceDbTpuClient(Builder b) {
    this.http = HttpClient.newBuilder().connectTimeout(b.timeout).build();
    this.baseUrl = b.baseUrl.replaceAll("/+$", "");
    this.timeout = b.timeout;
    this.apiKey = b.apiKey;
  }

  public static Builder builder() {
    return new Builder();
  }

  public static final class Builder {
    private String baseUrl = "http://127.0.0.1:8787";
    private Duration timeout = Duration.ofSeconds(30);
    private String apiKey;

    public Builder baseUrl(String url) {
      this.baseUrl = url;
      return this;
    }

    public Builder timeout(Duration t) {
      this.timeout = t;
      return this;
    }

    public Builder apiKey(String key) {
      this.apiKey = key;
      return this;
    }

    public LanceDbTpuClient build() {
      return new LanceDbTpuClient(this);
    }
  }

  // ---------------------------------------------------------- operations

  /** GET /v1/table — {"tables": [...]} */
  public String tableNames() throws IOException, InterruptedException {
    return new String(send("GET", "/v1/table", null, "application/json"),
        StandardCharsets.UTF_8);
  }

  /** POST /v1/table/{name}/describe — schema + version + stats JSON. */
  public String describe(String table) throws IOException, InterruptedException {
    return postJson(table, "describe", "{}");
  }

  /** POST /v1/table/{name}/count_rows with an optional predicate. */
  public long countRows(String table, String predicate)
      throws IOException, InterruptedException {
    String body = predicate == null
        ? "{}"
        : "{\"predicate\": \"" + predicate.replace("\"", "\\\"") + "\"}";
    return Long.parseLong(postJson(table, "count_rows", body).trim());
  }

  /** POST /v1/table/{name}/query — returns an Arrow IPC stream. */
  public byte[] query(String table, String queryJson)
      throws IOException, InterruptedException {
    return send("POST", tablePath(table, "query"), queryJson.getBytes(StandardCharsets.UTF_8),
        "application/json");
  }

  /** POST arbitrary table operation with a JSON body (create_index, delete, tags_*, ...). */
  public String postJson(String table, String op, String bodyJson)
      throws IOException, InterruptedException {
    byte[] out = send("POST", tablePath(table, op),
        bodyJson.getBytes(StandardCharsets.UTF_8), "application/json");
    return new String(out, StandardCharsets.UTF_8);
  }

  /** POST an Arrow IPC stream body (create / insert / merge_insert). */
  public String postArrow(String table, String opWithQuery, byte[] ipc)
      throws IOException, InterruptedException {
    byte[] out = send("POST", tablePath(table, opWithQuery), ipc,
        "application/vnd.apache.arrow.stream");
    return new String(out, StandardCharsets.UTF_8);
  }

  // ------------------------------------------------------------ plumbing

  private static String tablePath(String table, String op) {
    return "/v1/table/" + URLEncoder.encode(table, StandardCharsets.UTF_8) + "/" + op;
  }

  private byte[] send(String method, String path, byte[] body, String contentType)
      throws IOException, InterruptedException {
    HttpRequest.Builder rb = HttpRequest.newBuilder()
        .uri(URI.create(baseUrl + path))
        .timeout(timeout)
        .header("x-request-id", UUID.randomUUID().toString())
        .header("content-type", contentType);
    if (apiKey != null) {
      rb.header("authorization", "Bearer " + apiKey);
    }
    if ("GET".equals(method)) {
      rb.GET();
    } else {
      rb.POST(body == null
          ? HttpRequest.BodyPublishers.noBody()
          : HttpRequest.BodyPublishers.ofByteArray(body));
    }
    HttpResponse<byte[]> resp = http.send(rb.build(), HttpResponse.BodyHandlers.ofByteArray());
    if (resp.statusCode() >= 400) {
      throw new IOException("HTTP " + resp.statusCode() + ": "
          + new String(resp.body(), StandardCharsets.UTF_8));
    }
    return resp.body();
  }
}
