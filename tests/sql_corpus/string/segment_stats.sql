-- groups: string; tables: customer; ignoreOrder: false
SELECT c_mktsegment,
       min(length(c_name)) AS min_len,
       max(strpos(c_name, '#')) AS max_us,
       count(*) AS n
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
