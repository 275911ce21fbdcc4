// Minimal HTTP/1.1 server on POSIX sockets.
//
// Reference: serving/reagent/serving/cli/Server.cpp:7-70 (Simple-Web-Server
// REST endpoints POST /api/request and POST /api/feedback).
#pragma once

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <cstring>
#include <functional>
#include <map>
#include <string>
#include <thread>
#include <vector>

namespace reagent {

class HttpServer {
 public:
  using Handler = std::function<std::string(const std::string& body)>;

  explicit HttpServer(int port) : port_(port) {}
  ~HttpServer() { stop(); }

  void route(const std::string& path, Handler handler) {
    handlers_[path] = std::move(handler);
  }

  bool start() {
    fd_ = socket(AF_INET, SOCK_STREAM, 0);
    if (fd_ < 0) return false;
    int opt = 1;
    setsockopt(fd_, SOL_SOCKET, SO_REUSEADDR, &opt, sizeof(opt));
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
    addr.sin_port = htons(port_);
    if (bind(fd_, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) < 0) {
      close(fd_);
      return false;
    }
    if (listen(fd_, 64) < 0) {
      close(fd_);
      return false;
    }
    running_ = true;
    accept_thread_ = std::thread([this] { acceptLoop(); });
    return true;
  }

  void stop() {
    if (running_.exchange(false)) {
      shutdown(fd_, SHUT_RDWR);
      close(fd_);
      if (accept_thread_.joinable()) accept_thread_.join();
    }
  }

 private:
  void acceptLoop() {
    while (running_) {
      int client = accept(fd_, nullptr, nullptr);
      if (client < 0) break;
      std::thread([this, client] { handleClient(client); }).detach();
    }
  }

  void handleClient(int client) {
    std::string data;
    char buf[4096];
    size_t contentLength = 0;
    size_t headerEnd = std::string::npos;
    // read headers
    while (true) {
      ssize_t n = read(client, buf, sizeof(buf));
      if (n <= 0) { close(client); return; }
      data.append(buf, n);
      headerEnd = data.find("\r\n\r\n");
      if (headerEnd != std::string::npos) break;
      if (data.size() > 1 << 20) { close(client); return; }
    }
    // parse request line + content-length
    size_t lineEnd = data.find("\r\n");
    std::string requestLine = data.substr(0, lineEnd);
    std::string method = requestLine.substr(0, requestLine.find(' '));
    size_t pathStart = requestLine.find(' ') + 1;
    std::string path =
        requestLine.substr(pathStart, requestLine.find(' ', pathStart) - pathStart);
    std::string headers = data.substr(0, headerEnd);
    for (auto& c : headers) c = tolower(c);
    size_t clPos = headers.find("content-length:");
    if (clPos != std::string::npos) {
      contentLength = std::stoul(headers.substr(clPos + 15));
    }
    std::string body = data.substr(headerEnd + 4);
    while (body.size() < contentLength) {
      ssize_t n = read(client, buf, sizeof(buf));
      if (n <= 0) break;
      body.append(buf, n);
    }

    std::string responseBody;
    int status = 200;
    auto it = handlers_.find(path);
    if (it == handlers_.end()) {
      status = 404;
      responseBody = "{\"error\":\"not found\"}";
    } else {
      try {
        responseBody = it->second(body);
      } catch (const std::exception& e) {
        status = 500;
        responseBody = std::string("{\"error\":\"") + e.what() + "\"}";
      }
    }
    std::string response =
        "HTTP/1.1 " + std::to_string(status) + (status == 200 ? " OK" : " Error") +
        "\r\nContent-Type: application/json\r\nContent-Length: " +
        std::to_string(responseBody.size()) + "\r\nConnection: close\r\n\r\n" +
        responseBody;
    ssize_t unused = write(client, response.data(), response.size());
    (void)unused;
    close(client);
  }

  int port_;
  int fd_ = -1;
  std::atomic<bool> running_{false};
  std::thread accept_thread_;
  std::map<std::string, Handler> handlers_;
};

}  // namespace reagent
